"""Trajectory evaluation: ATE / RPE with Sim(3) alignment."""
