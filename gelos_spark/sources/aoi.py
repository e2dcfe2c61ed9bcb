"""AOI polygon loading from GeoJSON (driver-side).

The reference reads its vector inputs through geopandas
(gelos/embedding_transformation.py:19-30 extension dispatch); the
engine's AOI side is the SMALL dimension of the PIP join (SURVEY.md
§2.6 G6) and is consumed as a list of ring dicts, so parsing happens
on the driver with the stdlib json module — no Spark read needed.

Supported geometry types: Polygon (first ring = outer, rest = holes,
per RFC 7946 §3.1.6) and MultiPolygon (each part becomes its own AOI
entry sharing the feature's name). Antimeridian-crossing rings and
holes are handled downstream by the cover/refine unwrap logic.
"""

from __future__ import annotations

import json


def _ring(coords: list) -> list[tuple[float, float]]:
    return [(float(x), float(y)) for x, y, *_ in coords]


def read_aoi_geojson(path: str, id_key: str | None = None) -> list[dict]:
    """GeoJSON FeatureCollection -> the AOI dict list ``pip_join``
    consumes: [{aoi_id, name, ring, holes?}]. ``aoi_id`` comes from
    ``properties[id_key]`` when given (must be int-castable), else
    features number sequentially in file order (deterministic)."""
    with open(path) as f:
        doc = json.load(f)
    feats = doc.get("features")
    if feats is None:
        raise ValueError(f"{path}: not a GeoJSON FeatureCollection")
    out: list[dict] = []
    next_id = 0
    for feat in feats:
        geom = feat.get("geometry") or {}
        gtype = geom.get("type")
        props = feat.get("properties") or {}
        if id_key is not None:
            base_id = int(props[id_key])
        else:
            base_id = next_id
        name = str(props.get("name", f"aoi{base_id}"))
        if gtype == "Polygon":
            polys = [geom["coordinates"]]
        elif gtype == "MultiPolygon":
            polys = list(geom["coordinates"])
        else:
            raise ValueError(
                f"{path}: unsupported geometry type {gtype!r} (Polygon/MultiPolygon only)"
            )
        for j, rings in enumerate(polys):
            if not rings:
                raise ValueError(f"{path}: empty polygon in feature {name!r}")
            aoi = {
                "aoi_id": base_id if len(polys) == 1 else next_id + j,
                "name": name if len(polys) == 1 else f"{name}/{j}",
                "ring": _ring(rings[0]),
            }
            if len(rings) > 1:
                aoi["holes"] = [_ring(r) for r in rings[1:]]
            out.append(aoi)
        next_id = max(next_id, max(a["aoi_id"] for a in out) + 1)
    return out
