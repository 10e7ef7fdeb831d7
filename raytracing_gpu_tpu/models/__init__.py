"""Scene model: pytree dataclasses + parser + acceleration-structure tables."""
