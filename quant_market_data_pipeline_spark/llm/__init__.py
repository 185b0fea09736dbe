"""Large-scale training-data operators: text analysis, dedup families,
similarity search, multimodal column plumbing."""
