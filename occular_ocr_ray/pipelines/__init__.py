"""End-to-end pipelines: flagship extraction + relational query surface."""
