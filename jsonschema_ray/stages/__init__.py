"""Ray Data stages: actor-pool validators, table-level checks, sketches."""
