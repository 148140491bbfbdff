"""Extension query registry — filled in as extension operator modules land.

Kept separate from :mod:`.registry` so the reference-parity pack never
depends on extension imports.
"""

from __future__ import annotations


def build() -> dict:
    """Return {name: QuerySpec} for all implemented extension operators."""
    return {}
