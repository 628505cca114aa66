"""Host-side utilities: PNG IO, config, imaging."""
