"""Shared utilities: reporting, logging, seeding, CLI arguments."""
