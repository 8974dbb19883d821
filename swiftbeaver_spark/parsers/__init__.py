"""Carved-artifact parsers: browser SQLite databases -> relational tables."""
