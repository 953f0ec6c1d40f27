"""Query plans: the engine's operator-coverage corpus (SURVEY.md §2) as
(Spark builder, DuckDB oracle SQL) pairs, used by __spark_entry__ and bench."""
