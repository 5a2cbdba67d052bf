"""GML / KML markup interop for the canonical ring-list model.

Reference surface: ``Catalog.scala`` ST_AsGML / ST_AsKML /
ST_GeomFromGML / ST_GeomFromKML (JTS GMLWriter / the kml module there).
Emission follows the GML2 ``coordinates`` style JTS's GMLWriter produces
and the KML 2.2 Polygon schema; the parser additionally accepts GML3
``posList``. Shells CCW / holes CW on parse (same canonicalization as
the WKT/WKB readers); emitted rings carry the closing vertex, parsed
rings drop it.
"""

from __future__ import annotations

import re

import numpy as np


def _fmt_pairs(ring: np.ndarray, sep_xy: str, sep_pt: str) -> str:
    a = np.vstack([ring, ring[:1]])
    return sep_pt.join(f"{x:.10g}{sep_xy}{y:.10g}" for x, y in a)


def rings_to_gml(ring_list) -> str:
    """Canonical ring list → GML2 Polygon (outerBoundaryIs/innerBoundaryIs,
    ``coordinates`` as ``x,y`` pairs — JTS GMLWriter layout)."""
    rl = [np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in ring_list]
    parts = [
        "<gml:Polygon><gml:outerBoundaryIs><gml:LinearRing>"
        f"<gml:coordinates>{_fmt_pairs(rl[0], ',', ' ')}</gml:coordinates>"
        "</gml:LinearRing></gml:outerBoundaryIs>"
    ]
    for h in rl[1:]:
        parts.append(
            "<gml:innerBoundaryIs><gml:LinearRing>"
            f"<gml:coordinates>{_fmt_pairs(h, ',', ' ')}</gml:coordinates>"
            "</gml:LinearRing></gml:innerBoundaryIs>"
        )
    parts.append("</gml:Polygon>")
    return "".join(parts)


def rings_to_kml(ring_list) -> str:
    """Canonical ring list → KML 2.2 Polygon (coordinates ``lon,lat``
    whitespace-separated tuples)."""
    rl = [np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in ring_list]
    parts = [
        "<Polygon><outerBoundaryIs><LinearRing>"
        f"<coordinates>{_fmt_pairs(rl[0], ',', ' ')}</coordinates>"
        "</LinearRing></outerBoundaryIs>"
    ]
    for h in rl[1:]:
        parts.append(
            "<innerBoundaryIs><LinearRing>"
            f"<coordinates>{_fmt_pairs(h, ',', ' ')}</coordinates>"
            "</LinearRing></innerBoundaryIs>"
        )
    parts.append("</Polygon>")
    return "".join(parts)


_COORDS_RE = re.compile(
    r"<(?:\w+:)?(?:coordinates|posList)[^>]*>([^<]*)</(?:\w+:)?"
    r"(?:coordinates|posList)>"
)
_OUTER_RE = re.compile(
    r"<(?:\w+:)?(?:outerBoundaryIs|exterior)\b", re.IGNORECASE
)


def _parse_ring(text: str, pos_list: bool) -> np.ndarray:
    if pos_list:
        vals = np.array(
            [float(v) for v in text.split()], dtype=np.float64
        )
        a = vals.reshape(-1, 2)
    else:
        pts = [p for p in re.split(r"\s+", text.strip()) if p]
        a = np.array(
            [[float(v) for v in p.split(",")[:2]] for p in pts],
            dtype=np.float64,
        )
    if len(a) >= 2 and np.array_equal(a[0], a[-1]):
        a = a[:-1]
    return a


def _orient_ring(r: np.ndarray, ccw: bool) -> np.ndarray:
    x, y = r[:, 0], r[:, 1]
    area2 = float(
        np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)
    )
    if (area2 > 0) != ccw:
        return r[::-1].copy()
    return r


def parse_markup_rings(text: str) -> list[np.ndarray]:
    """GML (2 ``coordinates`` or 3 ``posList``) or KML Polygon text →
    canonical ring list (shell CCW first, holes CW). Ring order follows
    document order; the first ring inside the exterior/outerBoundaryIs
    element is the shell."""
    rings = []
    for m in _COORDS_RE.finditer(text):
        pos_list = "posList" in m.group(0).split(">", 1)[0]
        rings.append(_parse_ring(m.group(1), pos_list))
    if not rings:
        raise ValueError("no <coordinates>/<posList> element found")
    return [
        _orient_ring(r, ccw=(i == 0)) for i, r in enumerate(rings)
    ]
