"""mapreduce_paradigm_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``NickZaharia308/MapReduce-Paradigm``
(a pthread/shared-memory C++ MapReduce that builds a case-folded,
alphabetic-only, distinct-per-document inverted index —
``/root/reference/src/main.cpp``), generalized per SURVEY.md §2.B into a full
DataFrame operator library plus LLM-data-pipeline extensions (dedup,
similarity search, text analysis, multimodal plumbing) designed for 100 TB
scale.

Architecture: declarative DataFrame/SQL plans throughout — Catalyst provides
pushdown/pruning/join planning; Tungsten provides codegen/spill/vectorized IO.
No RDDs; pandas UDFs only where no native expression exists
(see ``operators/multimodal.py``).
"""

__version__ = "0.1.0"
