"""Source readers: external layout formats → the engine's span table."""
