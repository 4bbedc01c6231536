"""Repo tooling (generators, oracles, stress harnesses)."""
