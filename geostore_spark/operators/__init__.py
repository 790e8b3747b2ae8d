"""North-star operators: the LLM-training-data pipeline surface
(dedup, similarity search, multimodal columns, text analysis) plus
event-time windows — all designed as declarative DataFrame plans so they
inherit Catalyst's pushdown/pruning/AQE at 100 TB.
"""
