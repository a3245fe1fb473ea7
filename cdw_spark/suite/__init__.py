"""Driver-facing query suite: one module per operator family."""
