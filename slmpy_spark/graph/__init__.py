"""Graph operators over the canonical edge table (src, dst, weight)."""
