"""Training subsystem: losses, metrics, optimizer/schedule, train state,
jitted train/eval steps, and the epoch driver."""
