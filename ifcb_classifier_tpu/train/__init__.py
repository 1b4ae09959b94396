"""Training: train state, jit/pjit steps, epoch loop, checkpointing."""
