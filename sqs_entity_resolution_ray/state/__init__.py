"""Run state: checkpoint manifests, export tracker, delta computation."""
