"""Checkpoint manifests + resume planning (north_rule: per-partition
lineage + doc/term/byte metrics; the reference's analog is Redis AOF +
Postgres upsert idempotence, SURVEY §4)."""
