"""Training-data pipeline operators beyond the reference's surface
(SURVEY.md §7.5): deduplication, similarity search, text analysis,
multimodal column plumbing. Same design rules as the core engine:
native DataFrame ops first, Arrow-batched Pandas UDFs only where Spark
SQL genuinely can't express the semantics.
"""
