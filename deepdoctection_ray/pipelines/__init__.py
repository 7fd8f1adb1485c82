"""End-to-end pipelines (Dataset in → Dataset/summary out)."""
