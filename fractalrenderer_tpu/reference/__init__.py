"""CPU golden reference implementations (bit-consistency oracle)."""
