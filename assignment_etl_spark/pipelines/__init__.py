"""Pipeline compositions in reference execution order (SURVEY §3.1)."""
