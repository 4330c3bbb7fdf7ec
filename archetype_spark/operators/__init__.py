"""North-star operator family: dedup, similarity, text analysis,
multimodal plumbing, latest-state views — each designed for 100 TB
(blocked joins, no driver collects, no row-at-a-time Python)."""
