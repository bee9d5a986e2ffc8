"""Training: samplers, losses, optimizer/train-state, jitted steps."""
