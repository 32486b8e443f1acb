"""Multi-device sharding: mesh construction and data-parallel batch mapping."""
