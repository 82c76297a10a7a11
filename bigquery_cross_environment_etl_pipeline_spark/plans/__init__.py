"""Named logical plans: the SURVEY.md §2 inventory + north-star
extensions, each registered as a (spark_query, oracle_sql) pair via
``queries_catalog.register``.

- ``etl``       : reference-semantics operators (scan/count/watermark/
                  checkpoint/config/joins/scalars/pagination)
- ``analytics`` : grouped rollups, windows, set ops, cube/pivot, top-k
- ``llm``       : dedup / similarity / text analysis / multimodal
"""
