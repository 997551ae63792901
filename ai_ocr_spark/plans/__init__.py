"""Physical-plan auditing (SURVEY §4: verify pushdown/pruning/broadcast)."""
