"""wikidata_dump_processor_spark — a from-scratch PySpark-native
knowledge-graph construction engine with the query/data-processing
capabilities of gonter/wikidata-dump-processor (reference at
/root/reference, cited file:line throughout), re-designed for Spark:
DataFrame/Catalyst plans, variant-typed polymorphic values,
Arrow-batched pandas UDFs for the imperative slow path only.
"""

__version__ = "0.1.0"
