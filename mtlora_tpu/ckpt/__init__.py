"""Checkpointing: orbax save/restore + torch checkpoint conversion."""
