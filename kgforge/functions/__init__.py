"""Training-data pipeline functions: text stats, dedup, similarity, multimodal."""
