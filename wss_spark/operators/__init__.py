"""Operator library: the reference's analytics surface (SURVEY.md §2.4-2.7)
plus the large-scale training-data-pipeline operators (dedup, similarity,
text analysis, multimodal plumbing) as reusable DataFrame functions."""
