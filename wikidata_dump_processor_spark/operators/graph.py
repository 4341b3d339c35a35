"""K-hop neighborhood extraction over the triples graph.

The reference's per-entity point query (``wdq2.pl Q42``,
wdq2.pl:347-406) answers "all triples OF this entity"; a KG user's next
question is "...and of everything within k hops".  Re-expressed
Spark-first as an iterative frontier expansion, the same shape as the
CC loop (operators/canonicalize.py): k bounded iterations, each ONE
join of the triples table against the current frontier, lineage
truncated per hop with ``localCheckpoint``.

Traversal follows ENTITY-valued objects only (``^[QL]\\d+$`` — the
same id grammar the reference's get_items parses); literal objects
(dates, strings, JSON values) terminate a path but their triples are
still returned as part of the subgraph.

Scale notes (100 TB triples, bounded-k):

* the frontier is a 1-column id set — broadcast into the triples join
  while small (size-gated like rewrite_triples' remap broadcast), so a
  typical k-hop around a handful of seeds never shuffles the triples
  table at all: k broadcast-hash probes + parquet pushdown;
* above the gate the join falls back to shuffle; on the
  subject-bucketed ``triples_by_subj`` layout (plans/pipeline.py) the
  triples side is ALREADY hash-distributed on ``subj_num``, so only
  the frontier repartitions (Exchange on the 1-column side only);
* the accumulated subgraph/visited sets grow with the true neighborhood
  size — k-hop on a supernode explodes by nature; ``max_frontier``
  fails loudly before a runaway frontier melts the cluster (the same
  discipline as the mention scanner's broadcast gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENTITY_RE = r"^[QL]\d+$"


def k_hop_subgraph(
    triples: DataFrame,
    seeds: list[str] | DataFrame,
    k: int = 2,
    directed: bool = True,
    broadcast_limit: int = 5_000_000,
    max_frontier: int | None = 50_000_000,
    checkpoint: bool = True,
) -> DataFrame:
    """All (subj, pred, obj) triples reachable from ``seeds`` within
    ``k`` hops — hop 1 = the seeds' own triples.  ``directed=False``
    also traverses subj<-obj (the entity graph's undirected closure).

    ``seeds`` is a list of entity ids or a 1-column DataFrame of them.
    Returns the DISTINCT subgraph triple set.
    """
    spark = triples.sparkSession
    if isinstance(seeds, DataFrame):
        frontier = seeds.toDF("id").distinct()
    else:
        frontier = spark.createDataFrame([(s,) for s in set(seeds)], "id string")
    t = triples.select("subj", "pred", "obj").filter(
        F.col("subj").rlike(ENTITY_RE)
    )
    visited = frontier
    sub = None
    for _hop in range(k):
        n_frontier = frontier.count()  # bounded: id set, one short job
        if n_frontier == 0:
            break
        if max_frontier is not None and n_frontier > max_frontier:
            raise ValueError(
                f"frontier hit {n_frontier} ids (> max_frontier="
                f"{max_frontier}) at hop {_hop + 1}: a supernode "
                "neighborhood is exploding — lower k, raise the gate, or "
                "pre-filter predicates"
            )
        f_subj = (
            F.broadcast(frontier) if n_frontier <= broadcast_limit else frontier
        )
        hop_triples = t.join(
            f_subj.withColumnRenamed("id", "subj"), "subj", "left_semi"
        )
        if not directed:
            hop_triples = hop_triples.unionByName(
                t.join(f_subj.withColumnRenamed("id", "obj"), "obj", "left_semi")
                .select("subj", "pred", "obj")
            )
        if checkpoint:
            hop_triples = hop_triples.localCheckpoint(eager=False)
        sub = (
            hop_triples if sub is None else sub.unionByName(hop_triples)
        )
        # next frontier: newly reached entity endpoints
        ends = hop_triples.select(
            F.col("obj").alias("id")
        ).filter(F.col("id").rlike(ENTITY_RE))
        if not directed:
            ends = ends.unionByName(hop_triples.select(F.col("subj").alias("id")))
        frontier = ends.distinct().join(visited, "id", "left_anti")
        visited = visited.unionByName(frontier)
        if checkpoint:
            frontier = frontier.localCheckpoint(eager=False)
            visited = visited.localCheckpoint(eager=False)
    if sub is None:
        return t.limit(0)
    return sub.distinct()


def neighborhood_sizes(
    triples: DataFrame,
    seeds: list[str] | DataFrame,
    k: int = 2,
    **kw,
) -> dict:
    """Bounded profile of a k-hop expansion: {'triples': n, 'entities': m}
    for the subgraph — one aggregate over the k_hop result (a debugging /
    capacity-planning helper; collect is two scalars)."""
    sub = k_hop_subgraph(triples, seeds, k, **kw).localCheckpoint(eager=False)
    n_triples = sub.count()
    n_entities = (
        sub.select(F.col("subj").alias("id"))
        .unionByName(
            sub.select(F.col("obj").alias("id")).filter(
                F.col("id").rlike(ENTITY_RE)
            )
        )
        .distinct()
        .count()
    )
    return {"triples": n_triples, "entities": n_entities}
