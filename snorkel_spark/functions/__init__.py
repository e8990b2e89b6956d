"""Scalar LF helpers (§2.5), the LF applier (§2.6 A1) and label-matrix
analytics (§2.6 A4–A7)."""
