"""Sources & sinks: corpus preprocessors (SURVEY.md §2.1), the
interleaved-document synthesizer/scanner (S7), fixture generators
(FIXTURES.md §B), and synthetic label matrices (B5)."""
