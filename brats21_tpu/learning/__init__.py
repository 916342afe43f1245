"""Learning runtime: losses, Ranger/optax optimizers, schedules, SWA, AGC,
train state and the jitted engine."""
