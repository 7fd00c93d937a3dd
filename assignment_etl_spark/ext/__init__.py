"""Scale extensions beyond the reference's surface (BASELINE.json
north-star): dedup family, similarity search, text analysis, multimodal
column plumbing, streaming. All designed for the 100 TB path."""
