"""Bench exclusivity guard (tools/bench_lock.py, VERDICT r5 #5): the
flock keeps two bench jobs from ever measuring at once, and the
foreign-JVM sweep records contamination INTO the artifact instead of
leaving exclusion to hand forensics (round-5 run S)."""

import json
import os
import shutil
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _py(code: str, env=None, timeout=60):
    e = dict(os.environ)
    e.pop("BENCH_LOCK_HELD", None)
    if env:
        e.update(env)
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=e,
        capture_output=True, text=True, timeout=timeout,
    )


HOLD = (
    "import sys; sys.path.insert(0, '.');"
    "from tools.bench_lock import acquire_bench_lock;"
    "print(acquire_bench_lock(), flush=True);"
    "import time; time.sleep(15)"
)
TRY = (
    "import sys; sys.path.insert(0, '.');"
    "from tools.bench_lock import acquire_bench_lock;"
    "print(acquire_bench_lock(), flush=True)"
)


def test_lock_is_exclusive_and_loud(tmp_path):
    lock = str(tmp_path / "bench.lock")
    env = {"BENCH_LOCK_PATH": lock, "BENCH_LOCK_WAIT": "0"}
    e = dict(os.environ)
    e.pop("BENCH_LOCK_HELD", None)
    e.update(env)
    holder = subprocess.Popen(
        [sys.executable, "-c", HOLD], cwd=REPO, env=e,
        stdout=subprocess.PIPE, text=True,
    )
    try:
        assert holder.stdout.readline().strip() == "held"
        # second job: refuses, loudly, with the holder's identity
        r = _py(TRY, env=env)
        assert r.returncode == 3
        assert "held by" in r.stderr and "pid=" in r.stderr
        # a CHILD of the holding job inherits instead of deadlocking
        r2 = _py(TRY, env={**env, "BENCH_LOCK_HELD": "1"})
        assert r2.returncode == 0 and r2.stdout.strip() == "inherited"
    finally:
        holder.kill()
        holder.wait()
    # lock released with the holder -> next job acquires
    r3 = _py(TRY, env=env)
    assert r3.returncode == 0 and r3.stdout.strip() == "held"


DETECT = (
    "import sys, json; sys.path.insert(0, '.');"
    "from tools.bench_lock import foreign_spark_jvms;"
    "print(json.dumps(foreign_spark_jvms()))"
)


@pytest.fixture()
def fake_jvm_bin(tmp_path):
    # a real exec whose argv0 basename is `java` and whose cmdline says
    # spark: /bin/sh copied to .../java, told to sleep
    fake = tmp_path / "bin" / "java"
    fake.parent.mkdir()
    shutil.copy("/bin/sh", fake)
    return str(fake)


def test_foreign_jvm_detected_and_bench_owned_excluded(
    tmp_path, fake_jvm_bin
):
    """The contaminated-window simulation: a Spark-shaped JVM from an
    unrelated session is reported; one whose ancestry contains a
    bench.py process (the job's own fleet) is not."""
    foreign = subprocess.Popen(
        [fake_jvm_bin, "-c", "sleep 20",
         "org.apache.spark.deploy.SparkSubmit", "pyspark-shell"],
    )
    # owned twin: same fake JVM, but its parent is a `bench.py` process
    owned_script = tmp_path / "bench.py"
    owned_script.write_text(
        "import subprocess, sys, time\n"
        f"p = subprocess.Popen([{fake_jvm_bin!r}, '-c', 'sleep 20',\n"
        "    'org.apache.spark.deploy.SparkSubmit'])\n"
        "print(p.pid, flush=True)\n"
        "time.sleep(15)\n"
    )
    owner = subprocess.Popen(
        [sys.executable, str(owned_script)],
        stdout=subprocess.PIPE, text=True,
    )
    try:
        owned_pid = int(owner.stdout.readline())
        time.sleep(0.5)
        r = _py(DETECT)
        assert r.returncode == 0, r.stderr[-2000:]
        pids = set(json.loads(r.stdout.strip().splitlines()[-1]))
        assert foreign.pid in pids, (foreign.pid, pids)
        assert owned_pid not in pids, (owned_pid, pids)
    finally:
        foreign.kill()
        owner.kill()
        foreign.wait()
        owner.wait()


def test_bench_artifact_records_contamination(tmp_path, fake_jvm_bin):
    """End-to-end: a micro bench run alongside a fake foreign Spark JVM
    must come out with concurrent_spark_detected=true and the pid in
    foreign_spark_pids — the artifact carries its own exclusion
    verdict."""
    jvm = subprocess.Popen(
        [fake_jvm_bin, "-c", "sleep 240",
         "org.apache.spark.deploy.SparkSubmit", "pyspark-shell"],
    )
    try:
        env = dict(
            os.environ,
            BENCH_ONLY="kg_pipeline",
            BENCH_REPS="1",
            BENCH_KG_PAGES="400",
            BENCH_WARMUP="0",
            BENCH_WEAK_WINDOW="0",
            SPARK_GRAFT_CPUS="4",
            BENCH_LOCK_PATH=str(tmp_path / "bench.lock"),
            BENCH_SCRATCH=str(tmp_path / "scratch"),
        )
        env.pop("BENCH_LOCK_HELD", None)
        r = subprocess.run(
            [sys.executable, "bench.py"], cwd=REPO, env=env,
            capture_output=True, text=True, timeout=420,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
        art = json.loads(line)
        assert art["bench_lock"] == "held"
        assert art["concurrent_spark_detected"] is True
        assert jvm.pid in art["foreign_spark_pids"]
    finally:
        jvm.kill()
        jvm.wait()
