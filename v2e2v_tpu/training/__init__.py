"""Training: losses, optimizers, train loops."""
