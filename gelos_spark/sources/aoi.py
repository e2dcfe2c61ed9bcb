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


# MultiPolygon parts derive their id from the feature id: part j of
# feature f gets f * _PART_STRIDE + j, so explicit ids stay traceable
# to their feature and parts can never collide with another feature's
# id space (features with id_key must therefore use ids < 2^53/stride,
# and < _PART_STRIDE parts per feature — validated below)
_PART_STRIDE = 1000


def read_aoi_geojson(path: str, id_key: str | None = None) -> list[dict]:
    """GeoJSON FeatureCollection -> the AOI dict list ``pip_join``
    consumes: [{aoi_id, name, ring, holes?}]. ``aoi_id`` comes from
    ``properties[id_key]`` when given (must be int-castable), else
    features number sequentially in file order (deterministic).
    MultiPolygon parts get ``feature_id * 1000 + part`` when id_key is
    given (ids stay derived from properties, per the contract), else
    sequential part ids; any duplicate aoi_id across the file raises —
    pip_join would silently merge colliding AOIs' results otherwise."""
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
        if len(polys) > _PART_STRIDE:
            raise ValueError(
                f"{path}: feature {name!r} has {len(polys)} parts (max {_PART_STRIDE})"
            )
        for j, rings in enumerate(polys):
            if not rings:
                raise ValueError(f"{path}: empty polygon in feature {name!r}")
            if len(polys) == 1:
                part_id = base_id
            elif id_key is not None:
                part_id = base_id * _PART_STRIDE + j
            else:
                part_id = next_id + j
            aoi = {
                "aoi_id": part_id,
                "name": name if len(polys) == 1 else f"{name}/{j}",
                "ring": _ring(rings[0]),
            }
            if len(rings) > 1:
                aoi["holes"] = [_ring(r) for r in rings[1:]]
            out.append(aoi)
        next_id = max(next_id, max(a["aoi_id"] for a in out) + 1)
    ids = [a["aoi_id"] for a in out]
    if len(set(ids)) != len(ids):
        dupes = sorted({i for i in ids if ids.count(i) > 1})
        raise ValueError(f"{path}: duplicate aoi_id values {dupes}")
    return out
