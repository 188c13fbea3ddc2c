"""Large-scale training-data operations: dedup, similarity search,
text analysis, multimodal plumbing."""
