"""Query suites: each module registers named (spark, oracle) query
pairs into ``queries.REGISTRY`` covering one block of SURVEY.md §2."""
