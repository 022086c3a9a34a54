"""Deterministic synthetic sources (the engine's ``ElementTestDataSource``
analogue, reference ``reader/test/ElementTestDataSource.java``) and IO
helpers."""
