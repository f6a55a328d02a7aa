"""Conformance-test tooling (gie runner, distance metrics)."""
