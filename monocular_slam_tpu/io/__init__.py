"""IO: trajectory files, point-cloud export, state snapshots."""
