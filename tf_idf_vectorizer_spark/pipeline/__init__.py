"""Large-scale training-data pipeline operators over the corpus tables:
deduplication, similarity search, text quality, multimodal plumbing."""
