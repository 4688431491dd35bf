"""Column-level function library: text analysis + vector math."""
