"""Structured Streaming layer: stream catalog (CTAS-to-topic contract),
watermarked windows, interval joins, streaming LIMIT, stateful anomaly
detection. See SURVEY.md §2.9 / §7 M0-M3."""
