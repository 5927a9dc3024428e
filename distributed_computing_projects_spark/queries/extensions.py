"""Large-scale training-data pipeline extensions (placeholder module;
populated by the dedup / similarity / text-analysis / multimodal query
sets)."""
