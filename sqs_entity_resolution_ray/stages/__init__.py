"""Ray Data stages: each module exposes batch transforms / Dataset ops."""
