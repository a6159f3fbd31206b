"""Flax NN building blocks (reference: liteasr/nets/)."""
