"""Operators: span production (P1/P2), candidate spaces (C1–C4), matcher
algebra (M1–M9), entity linking (N1), canonicalization (N2/N3), plus the
training-data-pipeline operators (dedup, similarity, text stats,
multimodal plumbing).  See SURVEY.md §2 for the reference inventory."""
