"""Generative label model (SURVEY.md §2.7): sufficient-statistics
encoding, matrix-completion SGD fit, marginals, baselines, scorer."""
