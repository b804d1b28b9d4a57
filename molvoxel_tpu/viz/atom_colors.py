"""Element -> PyMOL color-name table for channel surfaces.

The reference ships a 118-entry symbol->color dict
(/root/reference/molvoxel/etc/pymol/atom.py:1-120).  Here the common
biochemistry elements get standard CPK-ish PyMOL colors and everything else
falls back by element family — same purpose, data-driven instead of a flat
dict.
"""

from __future__ import annotations

ELEMENT_COLORS = {
    "H": "white",
    "C": "gray",
    "N": "blue",
    "O": "red",
    "F": "palegreen",
    "Cl": "green",
    "Br": "firebrick",
    "I": "violet",
    "S": "yellow",
    "P": "orange",
    "B": "salmon",
    "Se": "chocolate",
    "Fe": "orange",
    "Zn": "slate",
    "Mg": "forest",
    "Ca": "gray",
    "Na": "purple",
    "K": "purple",
    "Cu": "brown",
    "Mn": "purple",
    "Co": "pink",
    "Ni": "green",
}

_HALOGENS = {"F", "Cl", "Br", "I", "At"}
_ALKALI = {"Li", "Na", "K", "Rb", "Cs", "Fr"}
_ALKALINE = {"Be", "Mg", "Ca", "Sr", "Ba", "Ra"}

# a rotating palette for non-element channels (bond channels, features)
CHANNEL_PALETTE = [
    "tv_red", "tv_blue", "tv_green", "tv_yellow", "tv_orange",
    "purple", "cyan", "magenta", "salmon", "lime", "slate", "olive",
]


def atom_color(symbol: str) -> str:
    if symbol in ELEMENT_COLORS:
        return ELEMENT_COLORS[symbol]
    if symbol in _HALOGENS:
        return "green"
    if symbol in _ALKALI or symbol in _ALKALINE:
        return "purple"
    return "wheat"


def channel_color(name: str, index: int) -> str:
    """Color for a named channel: element color when the name is an element
    symbol, else a palette rotation."""
    if name in ELEMENT_COLORS or (len(name) <= 2 and name.isalpha()):
        return atom_color(name)
    return CHANNEL_PALETTE[index % len(CHANNEL_PALETTE)]
