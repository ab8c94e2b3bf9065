"""Staged, resumable pipeline plans."""
