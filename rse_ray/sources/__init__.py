"""Input readers + deterministic fixture generators (no network, seeded)."""
