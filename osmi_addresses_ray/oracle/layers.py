"""Naive single-threaded oracle for the 11 address-view layers.

Recomputes every layer from the interleaved-docs spec with per-entity Python
loops — the slowest clearest shape — for driver hash-comparison against the
distributed engine. Written against the REFERENCE SEMANTICS (osmi-addresses,
cited per layer below), not against the engine code: the only engine imports
are the input fixture generator (the corpus under test) and none of the
stage/pipeline modules.

Float parity notes:
- WKT text uses Arrow's float64→string cast (shortest round-trip, "8" for
  8.0, unlike Python repr's "8.0") — all 11 layers format via the Arrow
  kernel since round 2.
- All distance / projection / centroid formulas are written with the same
  elementwise float64 (and, where the reference demands, float32) operations
  so results are bit-identical, not merely close.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

MAXDIST = 0.01  # ConnectionLinePreprocessor.hpp:11
MERC_R = 6378137.0
INT16_MAX = 32767

ADDR7 = (
    "addr:housenumber", "addr:street", "addr:postcode", "addr:city",
    "addr:country", "addr:full", "addr:place",
)
EP_COMPARE = (
    "addr:street", "addr:postcode", "addr:city", "addr:country",
    "addr:full", "addr:place",
)
ADDRX20 = (
    "addr:street", "addr:housenumber", "addr:full", "addr:conscriptionnumber",
    "addr:housename", "addr:place", "addr:postcode", "addr:flats", "addr:door",
    "addr:unit", "addr:floor", "addr:city", "addr:country", "addr:hamlet",
    "addr:suburb", "addr:district", "addr:subdistrict", "addr:province",
    "addr:region", "addr:state",
)
STREET_KEYS = (
    "name", "name:left", "name:right", "alt_name", "official_name",
    "short_name", "ref",
)


# --- formatting --------------------------------------------------------------

def _fmt(x: float) -> str:
    """Arrow float64→string (the engine sink's WKT number format)."""
    return pc.cast(pa.array([float(x)], pa.float64()), pa.string())[0].as_py()


def _wkt_point(lon: float, lat: float) -> str:
    return f"POINT ({_fmt(lon)} {_fmt(lat)})"


def _wkt_line2(x1, y1, x2, y2) -> str:
    return f"LINESTRING ({_fmt(x1)} {_fmt(y1)}, {_fmt(x2)} {_fmt(y2)})"


def _wkt_coords(xs, ys, *, polygon: bool) -> str:
    body = ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in zip(xs, ys))
    return f"POLYGON (({body}))" if polygon else f"LINESTRING ({body})"


# --- parsing (input spec: BASELINE.json input_hint) --------------------------

def parse_entities(docs: pa.Table) -> list[dict]:
    ents = []
    for row in docs.to_pylist():
        e = {
            "etype": None, "id": None, "lon": None, "lat": None,
            "refs": [], "tags": {}, "lastchange": "",
        }
        for span in row["spans"]:
            k, text = span["kind"], span["text"]
            if k == "osm:node":
                e["etype"], e["id"] = "node", int(text)
            elif k == "osm:way":
                e["etype"], e["id"] = "way", int(text)
            elif k == "geom":
                lon_s, lat_s = text.split(",", 1)
                lon_f, lat_f = float(lon_s), float(lat_s)
                # libosmium int32 fixed-point (1e-7°), round half away from 0
                e["lon"] = math.copysign(math.floor(abs(lon_f) * 1e7 + 0.5), lon_f) / 1e7
                e["lat"] = math.copysign(math.floor(abs(lat_f) * 1e7 + 0.5), lat_f) / 1e7
            elif k == "ref":
                e["refs"].append(int(text))
            elif k == "tag":
                tk, tv = text.split("=", 1)
                e["tags"][tk] = tv  # last duplicate wins
            elif k == "meta":
                e["lastchange"] = text
        ents.append(e)
    return ents


# --- geometry helpers (reference formulas) -----------------------------------

def _quant_bbox(s, n, w, e):
    """FirstHandler.hpp:66-70 int16 quantization, dequantized float32."""
    f = np.float32
    qn = float(np.int16(np.ceil(n * INT16_MAX / 90.0)).astype(f) * f(90) / f(INT16_MAX))
    qs = float(np.int16(np.floor(s * INT16_MAX / 90.0)).astype(f) * f(90) / f(INT16_MAX))
    qe = float(np.int16(np.ceil(e * INT16_MAX / 180.0)).astype(f) * f(180) / f(INT16_MAX))
    qw = float(np.int16(np.floor(w * INT16_MAX / 180.0)).astype(f) * f(180) / f(INT16_MAX))
    return qs, qn, qw, qe


def _near_bbox(qs, qn, qw, qe, lon, lat, tol=MAXDIST) -> bool:
    """GeometryHelper.hpp:127-152 — float32 arithmetic throughout."""
    f = np.float32
    lat32, lon32, t32 = f(lat), f(lon), f(tol)
    lon_tol = t32 / f(np.cos(np.deg2rad(lat32).astype(f)))
    return bool(
        (lat32 < f(qn) + t32)
        and (lat32 > f(qs) - t32)
        and (lon32 < f(qe) + lon_tol)
        and (lon32 > f(qw) - lon_tol)
    )


def _seqsum(a: np.ndarray) -> float:
    """Sum with np.add.reduceat's reduction order.

    Three float64 summation orders disagree in the last bits (np.sum's
    pairwise blocks, a sequential Python fold, and reduceat's SIMD order);
    the shoelace's catastrophic cancellation amplifies the difference to
    ~1e-10 in centroid coordinates. The engine reduces per ring with
    add.reduceat — use the same numpy primitive."""
    a = np.asarray(a, np.float64)
    if len(a) == 0:
        return 0.0
    return float(np.add.reduceat(a, [0])[0])


def _centroid(xs: np.ndarray, ys: np.ndarray):
    """OGRPolygon::Centroid — GEOS base-point triangle formulation (signed
    triangle areas relative to the ring's first vertex; numerically stable
    on degenerate rings) with GEOS's degenerate fallbacks."""
    x0, y0 = xs[0], ys[0]
    cross = (xs[:-1] - x0) * (ys[1:] - y0) - (xs[1:] - x0) * (ys[:-1] - y0)
    area2 = _seqsum(cross)
    if area2 != 0.0:
        cx = _seqsum(cross * (x0 + xs[:-1] + xs[1:])) / 3.0 / area2
        cy = _seqsum(cross * (y0 + ys[:-1] + ys[1:])) / 3.0 / area2
        return float(cx), float(cy)
    seg = np.hypot(np.diff(xs), np.diff(ys))
    total = _seqsum(seg)
    if total == 0.0:
        return float(xs[0]), float(ys[0])
    mx = _seqsum((xs[:-1] + xs[1:]) / 2.0 * seg) / total
    my = _seqsum((ys[:-1] + ys[1:]) / 2.0 * seg) / total
    return float(mx), float(my)


def _dist_polyline(px, py, xs, ys) -> float:
    """Min clamped point-segment distance (planar degrees), elementwise
    identical to the engine's flat sweep (CLPP.hpp:266 OGR Distance)."""
    x1, y1 = xs[:-1], ys[:-1]
    dx, dy = xs[1:] - x1, ys[1:] - y1
    seg2 = dx * dx + dy * dy
    seg2_safe = np.where(seg2 == 0.0, 1.0, seg2)
    t = ((px - x1) * dx + (py - y1) * dy) / seg2_safe
    t = np.where(seg2 > 0.0, np.clip(t, 0.0, 1.0), 0.0)
    return float(np.min(np.hypot(px - (x1 + t * dx), py - (y1 + t * dy))))


def _wgs2merc(lon, lat):
    x = MERC_R * np.deg2rad(np.asarray(lon, np.float64))
    y = MERC_R * np.log(np.tan(np.pi / 4.0 + np.deg2rad(np.asarray(lat, np.float64)) / 2.0))
    return x, y


def _merc2wgs(x, y):
    lon = np.rad2deg(np.asarray(x, np.float64) / MERC_R)
    lat = np.rad2deg(2.0 * np.arctan(np.exp(np.asarray(y, np.float64) / MERC_R)) - np.pi / 2.0)
    return float(lon), float(lat)


def _proj_clamped(ax, ay, bx, by, px, py):
    """CLPP.hpp:343-364 with the engine's clip formulation: r clipped to
    [0,1], result = a + r·(b−a) (NOT early-returning b, which differs in the
    last float bit when r == 1)."""
    dx, dy = bx - ax, by - ay
    den = dx * dx + dy * dy
    if den == 0.0:
        return ax, ay
    r = ((px - ax) * dx + (py - ay) * dy) / den
    r = 0.0 if r < 0.0 else (1.0 if r > 1.0 else r)
    return ax + r * dx, ay + r * dy


def _snap(px, py, xs, ys):
    """CLPP.hpp:283-338 — nearest (first-minimal) vertex in EPSG:3857, then
    the previous segment unconditionally and the next if strictly closer."""
    pmx, pmy = _wgs2merc(px, py)
    vx, vy = _wgs2merc(xs, ys)
    d = np.hypot(vx - pmx, vy - pmy)
    i = int(np.argmin(d))
    bx, by = float(vx[i]), float(vy[i])
    best = (bx, by)
    if i > 0:
        best = _proj_clamped(bx, by, float(vx[i - 1]), float(vy[i - 1]), pmx, pmy)
    if i < len(vx) - 1:
        cand = _proj_clamped(bx, by, float(vx[i + 1]), float(vy[i + 1]), pmx, pmy)
        if np.hypot(pmx - cand[0], pmy - cand[1]) < np.hypot(pmx - best[0], pmy - best[1]):
            best = cand
    return _merc2wgs(best[0], best[1])


# --- housenumber helpers (reference semantics) -------------------------------

U32 = 1 << 32


def _atoi(s: str) -> int:
    """C atoi: leading whitespace, optional sign, digits until non-digit."""
    i, n = 0, len(s)
    while i < n and s[i] in " \t\n\r\v\f":
        i += 1
    sign = 1
    if i < n and s[i] in "+-":
        sign = -1 if s[i] == "-" else 1
        i += 1
    v = 0
    while i < n and s[i].isdigit():
        v = v * 10 + int(s[i])
        i += 1
    return sign * v


def _u32(v: int) -> int:
    return v & (U32 - 1)


def _is_plain_number(raw: str, value: int) -> bool:
    """InterpolationWriter 'wrong format' check: str(value) round-trips."""
    return raw == str(value)


def _alpha_parts(first_raw: str, last_raw: str):
    """alphabetic interpolation: '<digits><single letter>' endpoints.

    Returns (status, first_ord, last_ord, first_numeric). Status mirrors the
    reference error strings; 'skip' when endpoints are absent."""
    if first_raw == "" or last_raw == "":
        return "skip", 0, 0, ""

    def split(raw):
        i = 0
        while i < len(raw) and raw[i].isdigit():
            i += 1
        return raw[:i], raw[i:]

    fnum, falpha = split(first_raw)
    lnum, lalpha = split(last_raw)
    if len(falpha) != 1 or len(lalpha) != 1 or not falpha.isalpha() or not lalpha.isalpha():
        return "no alphabetic part in addr:housenumber", 0, 0, ""
    if fnum != lnum:
        return "numeric parts of housenumbers not identical", 0, 0, ""
    return "ok", ord(falpha), ord(lalpha), fnum


def _validate_interp(way, first_tags, last_tags):
    """InterpolationWriter.hpp:39-237 ladder + densify (naive rerun)."""
    interpolation = way["tags"]["addr:interpolation"]
    first_raw = first_tags.get("addr:housenumber", "")
    last_raw = last_tags.get("addr:housenumber", "")
    row = {
        "way_id": way["id"],
        "typename": interpolation,
        "firstid": way["refs"][0],
        "lastid": way["refs"][-1],
        "firstno": first_raw if first_raw != "" else None,
        "lastno": last_raw if last_raw != "" else None,
        "error": None,
        "lastchange": way["lastchange"],
    }
    first = _u32(_atoi(first_raw)) if first_raw != "" else 0
    last = _u32(_atoi(last_raw)) if last_raw != "" else 0

    alpha_error = None
    is_alpha_ok = False
    first_numeric = ""
    if interpolation == "alphabetic":
        status, fa, la, fnum = _alpha_parts(first_raw, last_raw)
        if status == "ok":
            first, last, first_numeric = fa, la, fnum
            is_alpha_ok = True
        elif status != "skip":
            alpha_error = status

    xs, ys = way["xs"], way["ys"]
    ip_points = []
    err = None

    def diff(a, b):
        return a - b if a > b else b - a

    if interpolation not in ("all", "even", "odd", "alphabetic"):
        err = "unknown interpolation type"
    elif interpolation != "alphabetic" and (
        first == 0 or last == 0
        or not _is_plain_number(first_raw, first)
        or not _is_plain_number(last_raw, last)
    ):
        err = "endpoint has wrong format"
    elif diff(first, last) > 1000:
        err = "range too large"
    elif (interpolation in ("even", "odd") and diff(first, last) == 2) or (
        interpolation == "all" and diff(first, last) == 1
    ):
        err = "needless interpolation"
    elif interpolation == "even" and (first % 2 == 1 or last % 2 == 1):
        err = "interpolation even but number odd"
    elif interpolation == "odd" and (first % 2 == 0 or last % 2 == 0):
        err = "interpolation odd but number even"
    elif any(first_tags.get(k, "") != last_tags.get(k, "") for k in EP_COMPARE):
        err = "different tags on endpoints"
    elif way["is_closed"]:
        err = "interpolation is a closed way"
    elif (interpolation in ("all", "odd", "even") or is_alpha_ok) and first != last:
        seg = np.hypot(np.diff(xs), np.diff(ys))
        cum = np.concatenate(([0.0], np.cumsum(seg)))
        length = float(cum[-1])
        increment = 2 if interpolation in ("even", "odd") else 1
        if first < last:
            fraction = 1.0 / (last - first)
            lower, upper = first, last
        else:
            fraction = 1.0 / (first - last)
            increment = -increment
            lower, upper = last, first
        nr = _u32(first + increment)
        g = 0
        nrs = []
        while lower < nr < upper:
            nrs.append(nr)
            nr = _u32(nr + increment)
        if nrs:
            nrs_np = np.array(nrs, dtype=np.float64)
            if increment > 0:
                dists = (nrs_np - lower) * fraction * length
            else:
                dists = (1.0 - ((nrs_np - lower) * fraction)) * length
            d = np.clip(dists, 0.0, length)
            i = np.clip(np.searchsorted(cum, d, side="right") - 1, 0, max(len(seg) - 1, 0))
            segi = np.where(seg[i] > 0, seg[i], 1.0)
            r = np.where(seg[i] > 0, (d - cum[i]) / segi, 0.0)
            px = xs[i] + r * (xs[i + 1] - xs[i])
            py = ys[i] + r * (ys[i + 1] - ys[i])
            for g, nr_v in enumerate(nrs):
                nrstr = (
                    str(nr_v) if interpolation != "alphabetic" else first_numeric + chr(nr_v)
                )
                ip_points.append(
                    {
                        "lon": float(px[g]), "lat": float(py[g]),
                        "street": first_tags.get("addr:street", ""),
                        "houseno": nrstr,
                        "postcode": first_tags.get("addr:postcode", ""),
                        "city": first_tags.get("addr:city", ""),
                        "country": first_tags.get("addr:country", ""),
                        "fulladdr": first_tags.get("addr:full", ""),
                        "place": first_tags.get("addr:place", ""),
                        "ord": (1, way["id"], 0, g),
                    }
                )
    row["error"] = err if err is not None else alpha_error
    return row, ip_points


# --- the oracle --------------------------------------------------------------

def oracle_layers(docs: pa.Table) -> dict[str, pd.DataFrame]:
    ents = parse_entities(docs)
    nodes = {e["id"]: e for e in ents if e["etype"] == "node"}

    # way assembly (J1 semantics: drop on any unresolved ref, <2 refs)
    ways = []
    for e in ents:
        if e["etype"] != "way":
            continue
        if len(e["refs"]) < 2 or any(r not in nodes for r in e["refs"]):
            continue
        xs = np.array([nodes[r]["lon"] for r in e["refs"]], np.float64)
        ys = np.array([nodes[r]["lat"] for r in e["refs"]], np.float64)
        w = dict(e)
        w["xs"], w["ys"] = xs, ys
        w["is_closed"] = e["refs"][0] == e["refs"][-1]
        w["nonzero"] = bool(np.any((xs != xs[0]) | (ys != ys[0])))
        w["qbbox"] = _quant_bbox(ys.min(), ys.max(), xs.min(), xs.max())
        if w["is_closed"] and w["nonzero"]:
            w["centroid"] = _centroid(xs, ys)
        ways.append(w)

    L: dict[str, list] = {k: [] for k in (
        "entrances", "wwpc", "wwa", "addrx", "interp", "nwa", "cline", "npts", "ncand",
    )}

    # --- entrances (EntrancesWriter.hpp:20-37)
    for e in ents:
        if e["etype"] != "node":
            continue
        if "entrance" in e["tags"] or e["tags"].get("building") == "entrance":
            L["entrances"].append(
                {
                    "node_id": e["id"], "lastchange": e["lastchange"],
                    "entrance": e["tags"].get("entrance"),
                    "lon": e["lon"], "lat": e["lat"],
                    "geom_type": "POINT", "geom_wkt": _wkt_point(e["lon"], e["lat"]),
                }
            )

    # --- way-derived layers
    for w in ways:
        t = w["tags"]
        if not w["nonzero"]:
            continue
        if "postal_code" in t:
            L["wwpc"].append(
                {
                    "way_id": w["id"], "lastchange": w["lastchange"],
                    "postalcode": t["postal_code"],
                    "geom_type": "LINESTRING",
                    "geom_wkt": _wkt_coords(w["xs"], w["ys"], polygon=False),
                }
            )
        if (
            "building" in t and w["is_closed"]
            and ("addr:street" in t or "addr:housenumber" in t or "addr:place" in t)
        ):
            L["wwa"].append(
                {
                    "way_id": w["id"],
                    "street": t.get("addr:street"), "houseno": t.get("addr:housenumber"),
                    "postcode": t.get("addr:postcode"), "city": t.get("addr:city"),
                    "country": t.get("addr:country"), "fulladdr": t.get("addr:full"),
                    "place": t.get("addr:place"), "lastchange": w["lastchange"],
                    "geom_type": "POLYGON",
                    "geom_wkt": _wkt_coords(w["xs"], w["ys"], polygon=True),
                }
            )
        if not w["is_closed"] and any(k in t for k in ADDRX20):
            L["addrx"].append(
                {
                    "way_id": w["id"], "lastchange": w["lastchange"],
                    "geom_type": "LINESTRING",
                    "geom_wkt": _wkt_coords(w["xs"], w["ys"], polygon=False),
                }
            )

    # --- interpolation + ip points
    ip_all = []
    for w in ways:
        if "addr:interpolation" not in w["tags"] or not w["nonzero"]:
            continue
        ft = {
            k: v for k, v in nodes.get(w["refs"][0], {"tags": {}})["tags"].items() if k in ADDR7
        }
        lt = {
            k: v for k, v in nodes.get(w["refs"][-1], {"tags": {}})["tags"].items() if k in ADDR7
        }
        row, ips = _validate_interp(w, ft, lt)
        row["geom_type"] = "LINESTRING"
        row["geom_wkt"] = _wkt_coords(w["xs"], w["ys"], polygon=False)
        L["interp"].append(row)
        ip_all.extend(ips)

    # --- street index (FirstHandler.hpp:116-126; area split :72-80)
    streets_by_name: dict[str, list] = {}
    for w in ways:
        if "highway" not in w["tags"] or not w["nonzero"]:
            continue
        is_area = w["tags"].get("area") in ("yes", "true") and w["is_closed"]
        for k in STREET_KEYS:
            v = w["tags"].get(k)
            if v is not None:
                lst = streets_by_name.setdefault(v, [])
                if not any(s["way_id"] == w["id"] and s["name"] == v for s in lst):
                    lst.append(
                        {
                            "way_id": w["id"], "name": v, "is_area": is_area,
                            "xs": w["xs"], "ys": w["ys"], "qbbox": w["qbbox"],
                        }
                    )
    for lst in streets_by_name.values():
        lst.sort(key=lambda s: (not s["is_area"], s["way_id"]))  # scan order

    # --- places index (FirstHandler.hpp:24-36, :87-97)
    places: dict[str, tuple[list, list]] = {}
    for e in ents:
        if e["etype"] == "node" and "place" in e["tags"] and "name" in e["tags"]:
            places.setdefault(e["tags"]["name"], ([], []))[0].append(
                (e["id"], e["lon"], e["lat"])
            )
    for w in ways:
        if (
            "place" in w["tags"] and "name" in w["tags"]
            and w["is_closed"] and w["nonzero"]
        ):
            places.setdefault(w["tags"]["name"], ([], []))[1].append(
                (w["id"], w["centroid"][0], w["centroid"][1])
            )
    for name in places:
        places[name][0].sort()
        places[name][1].sort()

    # --- address points
    addrs = []
    for e in ents:
        if e["etype"] == "node" and any(k in e["tags"] for k in ADDR7):
            t = e["tags"]
            addrs.append(
                {
                    "kind": "node", "obj": e["id"], "lon": e["lon"], "lat": e["lat"],
                    "street": t.get("addr:street"), "place_name": t.get("addr:place"),
                    "nwa_emit": True,
                    "houseno": t.get("addr:housenumber"), "postcode": t.get("addr:postcode"),
                    "city": t.get("addr:city"), "country": t.get("addr:country"),
                    "fulladdr": t.get("addr:full"), "place": t.get("addr:place"),
                    "lastchange": e["lastchange"], "ord": (0, e["id"], 0, 0),
                }
            )
    for w in ways:
        t = w["tags"]
        if not (w["is_closed"] and w["nonzero"]):
            continue
        nwa_emit = "building" in t and ("addr:street" in t or "addr:housenumber" in t)
        match_gate = "addr:street" in t or "addr:place" in t
        if not (nwa_emit or match_gate):
            continue
        addrs.append(
            {
                "kind": "way", "obj": w["id"],
                "lon": w["centroid"][0], "lat": w["centroid"][1],
                "street": t.get("addr:street"), "place_name": t.get("addr:place"),
                "nwa_emit": nwa_emit,
                "houseno": t.get("addr:housenumber"), "postcode": t.get("addr:postcode"),
                "city": t.get("addr:city"), "country": t.get("addr:country"),
                "fulladdr": t.get("addr:full"), "place": t.get("addr:place"),
                "lastchange": w["lastchange"], "ord": (1, w["id"], 1, 0),
            }
        )
    for p in ip_all:
        addrs.append(
            {
                "kind": "ip", "obj": 0, "lon": p["lon"], "lat": p["lat"],
                "street": p["street"], "place_name": None, "nwa_emit": True,
                "houseno": p["houseno"], "postcode": p["postcode"], "city": p["city"],
                "country": p["country"], "fulladdr": p["fulladdr"], "place": p["place"],
                "lastchange": None, "ord": p["ord"],
            }
        )

    # --- J2/J4/J5 match per address
    for a in addrs:
        matched = None
        if a["street"] is not None:
            best_d = np.inf
            for s in streets_by_name.get(a["street"], []):
                if not _near_bbox(*s["qbbox"], a["lon"], a["lat"]):
                    continue
                d = _dist_polyline(a["lon"], a["lat"], s["xs"], s["ys"])
                if d < best_d:
                    best_d = d
                    matched = s
        nody_m = wayy_m = False
        place_lines = []

        def probe(name):
            nonlocal nody_m, wayy_m
            entry = places.get(name)
            if entry is None:
                return
            comb = entry[0] + entry[1]
            if not comb:
                return
            last = None
            for j, (pid, plon, plat) in enumerate(comb):
                if np.hypot(a["lon"] - plon, a["lat"] - plat) < MAXDIST:
                    last = j
            if last is None:
                return
            if last < len(entry[0]):
                nody_m = True
            else:
                wayy_m = True
            place_lines.append((comb[last][1], comb[last][2]))

        if a["kind"] == "node" and a["street"] is not None:
            probe(a["street"])
        if a["kind"] in ("node", "way") and a["place_name"] is not None:
            probe(a["place_name"])

        is_ip = a["kind"] == "ip"
        if a["nwa_emit"]:
            L["nwa"].append(
                {
                    "node_id": a["obj"] if a["kind"] == "node" else None,
                    "way_id": a["obj"] if a["kind"] == "way" else None,
                    "ip_id": None, "is_ip": np.int32(1 if is_ip else 0),
                    "street": a["street"], "houseno": a["houseno"],
                    "postcode": a["postcode"], "city": a["city"],
                    "country": a["country"], "fulladdr": a["fulladdr"],
                    "place": a["place"],
                    "road_id": "1" if matched is not None else None,
                    "nody_place_id": "1" if (nody_m and not is_ip) else None,
                    "wayy_place_id": "1" if (wayy_m and not is_ip) else None,
                    "lastchange": None if is_ip else a["lastchange"],
                    "lon": a["lon"], "lat": a["lat"],
                    "geom_type": "POINT", "geom_wkt": _wkt_point(a["lon"], a["lat"]),
                }
            )
        if matched is not None:
            sl, sa = _snap(a["lon"], a["lat"], matched["xs"], matched["ys"])
            L["cline"].append(
                {
                    "node_id": a["obj"] if a["kind"] == "node" else None,
                    "way_id": a["obj"] if a["kind"] == "way" else None,
                    "geom_type": "LINESTRING",
                    "geom_wkt": _wkt_line2(a["lon"], a["lat"], sl, sa),
                }
            )
            L["npts"].append(
                {
                    "way_id": matched["way_id"], "lon": sl, "lat": sa,
                    "geom_type": "POINT", "geom_wkt": _wkt_point(sl, sa),
                }
            )
            L["ncand"].append(
                {
                    "way_id": matched["way_id"], "name": a["street"],
                    "is_area": matched["is_area"],
                    "xs": matched["xs"], "ys": matched["ys"], "ord": a["ord"],
                }
            )
        for plon, plat in place_lines:
            L["cline"].append(
                {
                    "node_id": 0 if a["kind"] == "node" else None,
                    "way_id": 0 if a["kind"] == "way" else None,
                    "geom_type": "LINESTRING",
                    "geom_wkt": _wkt_line2(a["lon"], a["lat"], plon, plat),
                }
            )

    # --- nearest roads/areas: first candidate per way_id in processing order
    best_by_way: dict[int, dict] = {}
    for c in sorted(L["ncand"], key=lambda c: c["ord"]):
        best_by_way.setdefault(c["way_id"], c)
    roads, areas = [], []
    for c in best_by_way.values():
        row = {
            "way_id": c["way_id"], "name": c["name"], "lastchange": "",
            "geom_type": "POLYGON" if c["is_area"] else "LINESTRING",
            "geom_wkt": _wkt_coords(c["xs"], c["ys"], polygon=c["is_area"]),
        }
        (areas if c["is_area"] else roads).append(row)

    def df(rows, cols):
        if not rows:
            return pd.DataFrame({c: pd.Series([], dtype="object") for c in cols})
        return pd.DataFrame(rows)[cols]

    return {
        "osmi_addresses_entrances": df(
            L["entrances"],
            ["node_id", "lastchange", "entrance", "lon", "lat", "geom_type", "geom_wkt"],
        ),
        "osmi_addresses_ways_with_postal_code": df(
            L["wwpc"], ["way_id", "lastchange", "postalcode", "geom_type", "geom_wkt"]
        ),
        "osmi_addresses_ways_with_addresses": df(
            L["wwa"],
            ["way_id", "street", "houseno", "postcode", "city", "country",
             "fulladdr", "place", "lastchange", "geom_type", "geom_wkt"],
        ),
        "osmi_addresses_addrx_on_nonclosed_way": df(
            L["addrx"], ["way_id", "lastchange", "geom_type", "geom_wkt"]
        ),
        "osmi_addresses_interpolation": df(
            L["interp"],
            ["way_id", "typename", "firstid", "lastid", "firstno", "lastno",
             "error", "lastchange", "geom_type", "geom_wkt"],
        ),
        "osmi_addresses_nodes_with_addresses": df(
            L["nwa"],
            ["node_id", "way_id", "ip_id", "is_ip", "street", "houseno", "postcode",
             "city", "country", "fulladdr", "place", "road_id", "nody_place_id",
             "wayy_place_id", "lastchange", "lon", "lat", "geom_type", "geom_wkt"],
        ),
        "osmi_addresses_connection_line": df(
            L["cline"], ["node_id", "way_id", "geom_type", "geom_wkt"]
        ),
        "osmi_addresses_nearest_points": df(
            L["npts"], ["way_id", "lon", "lat", "geom_type", "geom_wkt"]
        ),
        "osmi_addresses_nearest_roads": df(
            roads, ["way_id", "name", "lastchange", "geom_type", "geom_wkt"]
        ),
        "osmi_addresses_nearest_areas": df(
            areas, ["way_id", "name", "lastchange", "geom_type", "geom_wkt"]
        ),
    }


# --- media features + PIP oracles (fixture-corpus checks) --------------------

def _oracle_media_pixels(ref: str) -> np.ndarray:
    """Independent reimplementation of the fake binary store's CONTENT spec
    (media_codecs.synthesize_pixels): sha256(ref) keys dims and an LCG-mixed
    index stream. Deliberately stops at PIXELS — the engine path additionally
    encodes to PPM/BMP bytes and decodes them back, so any codec bug (BGR
    swap, row order, padding) breaks the hash match against this oracle."""
    import hashlib

    d = hashlib.sha256(ref.encode()).digest()
    w = 8 + d[1] % 25
    h = 8 + d[2] % 25
    seed = np.uint64(int.from_bytes(d[4:12], "little"))
    idx = np.arange(h * w * 3, dtype=np.uint64)
    vals = ((idx * np.uint64(6364136223846793005) + seed) >> np.uint64(33)) & np.uint64(0xFF)
    return vals.astype(np.uint8).reshape(h, w, 3)


def oracle_media_features(docs: pa.Table) -> pd.DataFrame:
    """Feature spec: 4×4 grid of grayscale cell means over the real pixels,
    scaled to [-1, 1] (float32); width/height are the true image dims. The
    per-cell reduction is np.mean over float64 — the engine uses the same
    primitive, so values are bit-identical."""
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            img = _oracle_media_pixels(span["media_ref"])
            g = img.astype(np.float64).mean(axis=2)
            h, w = g.shape
            rb = (np.arange(5) * h) // 4
            cb = (np.arange(5) * w) // 4
            feat = np.empty(16, dtype=np.float32)
            for i in range(4):
                for j in range(4):
                    cell = g[rb[i] : rb[i + 1], cb[j] : cb[j + 1]]
                    feat[i * 4 + j] = np.float32(cell.mean() / 255.0 * 2.0 - 1.0)
            rows.append(
                {
                    "doc_id": row["doc_id"], "media_ref": span["media_ref"],
                    "feature": feat, "width": np.int32(w),
                    "height": np.int32(h),
                }
            )
    out = pd.DataFrame(rows, columns=["doc_id", "media_ref", "feature", "width", "height"])
    return out.sort_values(["doc_id", "media_ref"]).reset_index(drop=True)


def oracle_pip(docs: pa.Table) -> pd.DataFrame:
    """Entrance nodes ⨝-contains closed building rings (even-odd ray cast,
    identical crossing formula to the engine kernel)."""
    ents = parse_entities(docs)
    nodes = {e["id"]: e for e in ents if e["etype"] == "node"}
    pts = [
        e for e in ents
        if e["etype"] == "node"
        and ("entrance" in e["tags"] or e["tags"].get("building") == "entrance")
    ]
    out = []
    for e in ents:
        if e["etype"] != "way" or "building" not in e["tags"]:
            continue
        refs = e["refs"]
        if len(refs) < 2 or any(r not in nodes for r in refs) or refs[0] != refs[-1]:
            continue
        xs = np.array([nodes[r]["lon"] for r in refs], np.float64)
        ys = np.array([nodes[r]["lat"] for r in refs], np.float64)
        if not np.any((xs != xs[0]) | (ys != ys[0])):
            continue
        bs, bn, bw, be = ys.min(), ys.max(), xs.min(), xs.max()
        for p in pts:
            px, py = p["lon"], p["lat"]
            if not (bs <= py <= bn and bw <= px <= be):
                continue
            x1, y1, x2, y2 = xs[:-1], ys[:-1], xs[1:], ys[1:]
            cond = (y1 > py) != (y2 > py)
            denom = np.where(y2 - y1 == 0.0, 1.0, y2 - y1)
            xint = x1 + (py - y1) * (x2 - x1) / denom
            if int((cond & (px < xint)).sum()) % 2 == 1:
                out.append({"point_id": p["id"], "poly_id": e["id"]})
    res = pd.DataFrame(out, columns=["point_id", "poly_id"])
    if res.empty:
        res = pd.DataFrame(
            {"point_id": pd.Series([], dtype="int64"), "poly_id": pd.Series([], dtype="int64")}
        )
    return res.sort_values(["point_id", "poly_id"]).reset_index(drop=True)


def oracle_media_resize(docs: pa.Table, out_w: int = 16, out_h: int = 16) -> pd.DataFrame:
    """Scalar recomputation of the resize summaries straight from the
    synthesized PIXELS (bypassing the codecs, so a codec bug breaks the
    gate): nearest-neighbor index (i*H)//out_h, python-int sum and
    position-weighted fold mod 999999937."""
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            img = _oracle_media_pixels(span["media_ref"])
            h, w = img.shape[:2]
            px = []
            for i in range(out_h):
                for j in range(out_w):
                    for c in range(3):
                        px.append(int(img[(i * h) // out_h, (j * w) // out_w, c]))
            fold = sum((k + 1) * v for k, v in enumerate(px)) % 999999937
            rows.append(
                {
                    "doc_id": row["doc_id"], "media_ref": span["media_ref"],
                    "src_width": np.int32(w), "src_height": np.int32(h),
                    "out_width": np.int32(out_w), "out_height": np.int32(out_h),
                    "px_sum": np.int64(sum(px)), "px_fold": np.int64(fold),
                }
            )
    cols = ["doc_id", "media_ref", "src_width", "src_height",
            "out_width", "out_height", "px_sum", "px_fold"]
    return pd.DataFrame(rows, columns=cols).sort_values(
        ["doc_id", "media_ref"]).reset_index(drop=True)


def oracle_geohash(nwa: pd.DataFrame, precision: int = 7) -> pd.DataFrame:
    """Scalar geohash recomputation: per-point python-int interval bits via
    divmod over the exact 1e-7 rational ranges, base32 char by char."""
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    out = []
    for lon, lat in zip(nwa["lon"], nwa["lat"]):
        lon7 = int(math.copysign(math.floor(abs(lon) * 1e7 + 0.5), lon))
        lat7 = int(math.copysign(math.floor(abs(lat) * 1e7 + 0.5), lat))
        bits = []
        # interval endpoints scaled by 2^(5p) so every midpoint is an exact
        # python int (the first ~22 float halvings would be exact too, but
        # not the deep ones — ints make the whole ladder exact)
        scale = 1 << (5 * precision)
        xlo, xhi = -1800000000 * scale, 1800000000 * scale
        ylo, yhi = -900000000 * scale, 900000000 * scale
        xv, yv = lon7 * scale, lat7 * scale
        for b in range(5 * precision):
            if b % 2 == 0:
                mid = (xlo + xhi) // 2
                if xv >= mid:
                    bits.append(1)
                    xlo = mid
                else:
                    bits.append(0)
                    xhi = mid
            else:
                mid = (ylo + yhi) // 2
                if yv >= mid:
                    bits.append(1)
                    ylo = mid
                else:
                    bits.append(0)
                    yhi = mid
        s = ""
        for g in range(precision):
            v = 0
            for bit in bits[5 * g : 5 * g + 5]:
                v = v * 2 + bit
            s += alphabet[v]
        out.append(s)
    res = nwa[["node_id", "ip_id", "lon", "lat"]].copy()
    # pin the nullable string dtype: an all-null object column would be
    # written to the oracle parquet as DOUBLE and break the schema compare
    res["ip_id"] = res["ip_id"].astype("string")
    res["geohash"] = out
    return res.sort_values(["node_id", "ip_id", "lon", "lat"]).reset_index(drop=True)


def _oracle_audio_samples(ref: str, n: int = 2048) -> np.ndarray:
    """Independent reimplementation of the fake audio store's CONTENT spec
    (media_codecs.synthesize_audio_samples) — stops at raw PCM; the engine
    additionally encodes/decodes RIFF, so a WAV parser bug breaks the gate."""
    import hashlib

    d = hashlib.sha256(ref.encode()).digest()
    seed = np.uint64(int.from_bytes(d[12:20], "little"))
    idx = np.arange(n, dtype=np.uint64)
    vals = ((idx * np.uint64(6364136223846793005) + seed) >> np.uint64(33)) & np.uint64(0xFFFF)
    return (vals.astype(np.int64) - 32768).astype(np.int16)


def _oracle_video_frames(ref: str) -> np.ndarray:
    import hashlib

    d = hashlib.sha256(ref.encode()).digest()
    t = 4 + d[3] % 8
    w = 8 + d[1] % 16
    h = 8 + d[2] % 16
    seed = np.uint64(int.from_bytes(d[20:28], "little"))
    idx = np.arange(t * h * w * 3, dtype=np.uint64)
    vals = ((idx * np.uint64(6364136223846793005) + seed) >> np.uint64(33)) & np.uint64(0xFF)
    return vals.astype(np.uint8).reshape(t, h, w, 3)


def oracle_audio_features(docs: pa.Table) -> pd.DataFrame:
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            s = _oracle_audio_samples(span["media_ref"])
            rows.append(
                {
                    "doc_id": row["doc_id"], "media_ref": span["media_ref"],
                    "sample_rate": np.int32(16000), "n_samples": np.int64(len(s)),
                    "sum_sq": np.int64(sum(int(v) * int(v) for v in s)),
                    "peak": np.int64(max(abs(int(v)) for v in s)),
                }
            )
    cols = ["doc_id", "media_ref", "sample_rate", "n_samples", "sum_sq", "peak"]
    return pd.DataFrame(rows, columns=cols).sort_values(
        ["doc_id", "media_ref"]).reset_index(drop=True)


def oracle_video_frame_sample(docs: pa.Table, stride: int = 2) -> pd.DataFrame:
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            frames = _oracle_video_frames(span["media_ref"])
            sampled = frames[::stride]
            px = [int(v) for v in sampled.ravel()]
            fold = sum((k + 1) * v for k, v in enumerate(px)) % 999999937
            rows.append(
                {
                    "doc_id": row["doc_id"], "media_ref": span["media_ref"],
                    "n_frames": np.int32(frames.shape[0]),
                    "n_sampled": np.int32(sampled.shape[0]),
                    "px_sum": np.int64(sum(px)), "px_fold": np.int64(fold),
                }
            )
    cols = ["doc_id", "media_ref", "n_frames", "n_sampled", "px_sum", "px_fold"]
    return pd.DataFrame(rows, columns=cols).sort_values(
        ["doc_id", "media_ref"]).reset_index(drop=True)


def oracle_hilbert(nwa: pd.DataFrame, order: int = 16) -> pd.DataFrame:
    """Scalar Hilbert distance per point: classic xy2d loop on python ints
    over the same exact-integer grid quantization."""
    out = []
    n = 1 << order
    for lon, lat in zip(nwa["lon"], nwa["lat"]):
        lon7 = int(math.copysign(math.floor(abs(lon) * 1e7 + 0.5), lon))
        lat7 = int(math.copysign(math.floor(abs(lat) * 1e7 + 0.5), lat))
        x = min(max((lon7 + 1800000000) * n // 3600000000, 0), n - 1)
        y = min(max((lat7 + 900000000) * n // 1800000000, 0), n - 1)
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            s //= 2
        out.append(d)
    res = nwa[["node_id", "ip_id", "lon", "lat"]].copy()
    res["ip_id"] = res["ip_id"].astype("string")
    res["hilbert_d"] = np.array(out, dtype=np.int64)
    return res.sort_values(["node_id", "ip_id", "lon", "lat"]).reset_index(drop=True)


def oracle_media_histogram(docs: pa.Table) -> pd.DataFrame:
    """Scalar recomputation of the per-channel 4-bucket color histograms
    straight from the synthesized PIXELS (codec-bypassing): bucket =
    value // 64, python-int counts."""
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            img = _oracle_media_pixels(span["media_ref"])
            rec = {"doc_id": row["doc_id"], "media_ref": span["media_ref"]}
            for c, ch in enumerate("rgb"):
                counts = [0, 0, 0, 0]
                for v in img[:, :, c].ravel().tolist():
                    counts[int(v) // 64] += 1
                for b in range(4):
                    rec[f"{ch}{b}"] = np.int64(counts[b])
            rows.append(rec)
    cols = ["doc_id", "media_ref"] + [f"{ch}{b}" for ch in "rgb" for b in range(4)]
    return pd.DataFrame(rows, columns=cols).sort_values(
        ["doc_id", "media_ref"]).reset_index(drop=True)


def _xy2d_scalar(x: int, y: int, nbits: int) -> int:
    """Python-int Hilbert xy→d (same quadrant-fold variant as the engine's
    vectorized hilbert_xy2d, rewritten scalar)."""
    d = 0
    s = 1 << (nbits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def _quad_cell_scalar(x: float, y: float, z: float, level: int) -> int:
    """Scalar cube-sphere quadtree cell id from a unit-sphere point: same
    face/uv/st spec as functions/s2quad (all exactly-rounded IEEE ops)."""
    ax, ay, az = abs(x), abs(y), abs(z)
    if az >= max(ax, ay):
        f = 2 if z >= 0 else 5
    elif ay > ax:
        f = 1 if y >= 0 else 4
    else:
        f = 0 if x >= 0 else 3
    if f == 0:
        u, v = y / x, z / x
    elif f == 1:
        u, v = -x / y, z / y
    elif f == 2:
        u, v = -x / z, -y / z
    elif f == 3:
        u, v = z / x, y / x
    elif f == 4:
        u, v = z / y, -x / y
    else:
        u, v = -y / z, -x / z

    def st(w: float) -> float:
        return (
            0.5 * math.sqrt(1.0 + 3.0 * w)
            if w >= 0.0
            else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * w)
        )

    n = 1 << level
    i = min(max(int(math.floor(st(u) * n)), 0), n - 1)
    j = min(max(int(math.floor(st(v) * n)), 0), n - 1)
    return (f << (2 * level)) + _xy2d_scalar(i, j, level)


def _oracle_sphere_xyz(nwa: pd.DataFrame):
    """Trig through the SAME numpy array primitive the engine uses — sin/cos
    SIMD kernels are not guaranteed ulp-identical to libm scalars, and a
    1-ulp flip at a grid boundary would change the cell. Everything AFTER
    the trig is exactly-rounded IEEE and recomputed per-point in scalar
    python, so the structural spec stays independent."""
    lam = np.deg2rad(nwa["lon"].to_numpy(np.float64))
    phi = np.deg2rad(nwa["lat"].to_numpy(np.float64))
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def oracle_quad_cells(nwa: pd.DataFrame, level_fine: int = 12, level_coarse: int = 8) -> pd.DataFrame:
    X, Y, Z = _oracle_sphere_xyz(nwa)
    fine, coarse = [], []
    for idx in range(len(nwa)):
        x, y, z = float(X[idx]), float(Y[idx]), float(Z[idx])
        fine.append(_quad_cell_scalar(x, y, z, level_fine))
        coarse.append(_quad_cell_scalar(x, y, z, level_coarse))
    res = nwa[["node_id", "ip_id", "lon", "lat"]].copy()
    res["ip_id"] = res["ip_id"].astype("string")
    res["cell_l12"] = np.array(fine, dtype=np.int64)
    res["cell_l8"] = np.array(coarse, dtype=np.int64)
    return res.sort_values(["node_id", "ip_id", "lon", "lat"]).reset_index(drop=True)


def oracle_quad_rollup(nwa: pd.DataFrame, level_fine: int = 12, level_coarse: int = 8) -> pd.DataFrame:
    cells = oracle_quad_cells(nwa, level_fine, level_coarse)
    per_fine: dict[int, int] = {}
    fine_to_coarse: dict[int, int] = {}
    for cf, cc in zip(cells["cell_l12"], cells["cell_l8"]):
        per_fine[int(cf)] = per_fine.get(int(cf), 0) + 1
        fine_to_coarse[int(cf)] = int(cc)
    agg: dict[int, list[int]] = {}
    for cf, cnt in per_fine.items():
        cc = fine_to_coarse[cf]
        if cc not in agg:
            agg[cc] = [0, 0]
        agg[cc][0] += cnt
        agg[cc][1] += 1
    rows = [
        {"cell_l8": np.int64(cc), "n_points": np.int64(v[0]), "n_child_cells": np.int64(v[1])}
        for cc, v in agg.items()
    ]
    return pd.DataFrame(rows).sort_values("cell_l8").reset_index(drop=True)


def oracle_scene_cuts(docs: pa.Table) -> pd.DataFrame:
    """Scalar shot-boundary recomputation: per-frame 4-bin/channel histogram
    via plain dict counting, pairwise L1, fixed threshold 15."""
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            frames = _oracle_video_frames(span["media_ref"])
            t, h, w, _ = frames.shape
            hists = []
            for f in range(t):
                counts = [0] * 12
                for px in frames[f].reshape(-1, 3):
                    for c in range(3):
                        counts[c * 4 + (int(px[c]) >> 6)] += 1
                hists.append(counts)
            dists = [
                sum(abs(a - b) for a, b in zip(hists[i], hists[i + 1]))
                for i in range(t - 1)
            ]
            thr = 15
            rows.append(
                {
                    "doc_id": row["doc_id"], "media_ref": span["media_ref"],
                    "n_frames": np.int32(t),
                    "n_cuts": np.int32(sum(1 for d in dists if d > thr)),
                    "max_dist": np.int64(max(dists) if dists else 0),
                    "sum_dist": np.int64(sum(dists)),
                }
            )
    cols = ["doc_id", "media_ref", "n_frames", "n_cuts", "max_dist", "sum_dist"]
    return pd.DataFrame(rows, columns=cols).sort_values(
        ["doc_id", "media_ref"]).reset_index(drop=True)


def oracle_media_dhash(docs: pa.Table) -> pd.DataFrame:
    """Scalar dHash recomputation: per-cell integer sums by explicit loops,
    bit = exact cross-multiplied brightness comparison, MSB-first fold."""
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            img = _oracle_media_pixels(span["media_ref"])
            h, w = img.shape[:2]
            rb = [(i * h) // 8 for i in range(9)]
            cb = [(j * w) // 9 for j in range(10)]
            cell = [[0] * 9 for _ in range(8)]
            for i in range(8):
                for j in range(9):
                    s = 0
                    for y in range(rb[i], rb[i + 1]):
                        for x in range(cb[j], cb[j + 1]):
                            s += int(img[y, x, 0]) + int(img[y, x, 1]) + int(img[y, x, 2])
                    cell[i][j] = s
            hv = 0
            for i in range(8):
                ai = rb[i + 1] - rb[i]
                for j in range(8):
                    al = ai * (cb[j + 1] - cb[j])
                    ar = ai * (cb[j + 2] - cb[j + 1])
                    bit = 1 if cell[i][j] * ar > cell[i][j + 1] * al else 0
                    hv = (hv << 1) | bit
            if hv >= 1 << 63:
                hv -= 1 << 64
            rows.append(
                {"doc_id": row["doc_id"], "media_ref": span["media_ref"],
                 "dhash": np.int64(hv)}
            )
    return pd.DataFrame(rows, columns=["doc_id", "media_ref", "dhash"]).sort_values(
        ["doc_id", "media_ref"]).reset_index(drop=True)


def oracle_audio_windows(docs: pa.Table) -> pd.DataFrame:
    """Scalar windowed-energy recomputation: explicit per-window loops over
    the raw PCM spec, window 256, threshold 92e9, first-argmin ties."""
    win, thr = 256, 92_000_000_000
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            s = [int(v) for v in _oracle_audio_samples(span["media_ref"])]
            nw = len(s) // win
            energies = [
                sum(v * v for v in s[i * win:(i + 1) * win]) for i in range(nw)
            ]
            if nw == 0:
                n_low, mn, mw, mx = 0, 0, -1, 0
            else:
                n_low = sum(1 for e in energies if e < thr)
                mn = min(energies)
                mw = energies.index(mn)
                mx = max(energies)
            rows.append(
                {
                    "doc_id": row["doc_id"], "media_ref": span["media_ref"],
                    "n_windows": np.int64(nw), "n_low": np.int64(n_low),
                    "min_energy": np.int64(mn), "min_window": np.int64(mw),
                    "max_energy": np.int64(mx),
                }
            )
    cols = ["doc_id", "media_ref", "n_windows", "n_low",
            "min_energy", "min_window", "max_energy"]
    return pd.DataFrame(rows, columns=cols).sort_values(
        ["doc_id", "media_ref"]).reset_index(drop=True)


def oracle_audio_pitch(docs: pa.Table) -> pd.DataFrame:
    """Independent autocorrelation-pitch recomputation over the raw PCM
    spec: per-lag integer dot products (sliced np.dot converted to python
    int per lag — decomposition-diverse from the engine's single strided
    matmul), fixed window W = n-160, lags 32..160, first argmax, r0 over
    the whole clip, voiced iff 4*r_best > r0. Rate is the WAV encoder's
    fixed 16000 (the engine reads it back out of the RIFF header)."""
    lag_min, lag_max = 32, 160
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            s = _oracle_audio_samples(span["media_ref"]).astype(np.int64)
            n = len(s)
            r0 = int(np.dot(s, s))
            w = n - lag_max
            if w <= 0:
                best_lag, r_best, voiced = -1, 0, 0
            else:
                left = s[:w]
                best_lag, r_best = -1, None
                for lag in range(lag_min, lag_max + 1):
                    r = int(np.dot(left, s[lag : lag + w]))
                    if r_best is None or r > r_best:  # strict > == first argmax
                        best_lag, r_best = lag, r
                voiced = 1 if 4 * r_best > r0 else 0
            rows.append(
                {
                    "doc_id": row["doc_id"], "media_ref": span["media_ref"],
                    "n_samples": np.int64(n), "sample_rate": np.int64(16000),
                    "r0": np.int64(r0), "best_lag": np.int64(best_lag),
                    "r_best": np.int64(r_best or 0), "voiced": np.int64(voiced),
                }
            )
    cols = ["doc_id", "media_ref", "n_samples", "sample_rate", "r0",
            "best_lag", "r_best", "voiced"]
    return pd.DataFrame(rows, columns=cols).sort_values(
        ["doc_id", "media_ref"]).reset_index(drop=True)


def oracle_audio_onsets(docs: pa.Table) -> pd.DataFrame:
    """Scalar onset recomputation over the raw PCM spec: explicit
    per-window energy loops, onset iff e[i] > 4*e[i-1] and e[i] >= 5e10,
    sharpest jump by cross-multiplied rational compare (first on ties) —
    pure python ints, algorithm-diverse from the engine's boolean masks."""
    win, ratio, emin = 256, 4, 50_000_000_000
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            s = [int(v) for v in _oracle_audio_samples(span["media_ref"])]
            nw = len(s) // win
            e = [sum(v * v for v in s[i * win:(i + 1) * win]) for i in range(nw)]
            onsets = [
                i for i in range(1, nw) if e[i] > ratio * e[i - 1] and e[i] >= emin
            ]
            if not onsets:
                first, num, den = -1, 0, 0
            else:
                first = onsets[0]
                best = onsets[0]
                for i in onsets[1:]:
                    if e[i] * e[best - 1] > e[best] * e[i - 1]:
                        best = i
                num, den = e[best], e[best - 1]
            rows.append(
                {
                    "doc_id": row["doc_id"], "media_ref": span["media_ref"],
                    "n_windows": np.int64(nw), "n_onsets": np.int64(len(onsets)),
                    "first_onset": np.int64(first),
                    "max_jump_num": np.int64(num), "max_jump_den": np.int64(den),
                }
            )
    cols = ["doc_id", "media_ref", "n_windows", "n_onsets", "first_onset",
            "max_jump_num", "max_jump_den"]
    return pd.DataFrame(rows, columns=cols).sort_values(
        ["doc_id", "media_ref"]).reset_index(drop=True)


def oracle_media_blobs(docs: pa.Table) -> pd.DataFrame:
    """Scalar blob recomputation: explicit BFS flood fill over the raw
    pixel spec (threshold r+g+b >= 384, 4-connectivity), per-blob size and
    min row-major index; largest by (size, then smallest anchor) —
    algorithm-diverse from the engine's pair-list union-find."""
    thr = 384
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            img = _oracle_media_pixels(span["media_ref"])
            h, w = img.shape[:2]
            fg = [
                [int(img[y, x, 0]) + int(img[y, x, 1]) + int(img[y, x, 2]) >= thr
                 for x in range(w)]
                for y in range(h)
            ]
            seen = [[False] * w for _ in range(h)]
            blobs = []  # (size, min_idx)
            n_fg = 0
            for y in range(h):
                for x in range(w):
                    if not fg[y][x]:
                        continue
                    n_fg += 1
                    if seen[y][x]:
                        continue
                    stack = [(y, x)]
                    seen[y][x] = True
                    size, mn = 0, y * w + x
                    while stack:
                        cy, cx = stack.pop()
                        size += 1
                        if cy * w + cx < mn:
                            mn = cy * w + cx
                        for ny, nx in ((cy-1, cx), (cy+1, cx), (cy, cx-1), (cy, cx+1)):
                            if 0 <= ny < h and 0 <= nx < w and fg[ny][nx] and not seen[ny][nx]:
                                seen[ny][nx] = True
                                stack.append((ny, nx))
                    blobs.append((size, mn))
            if not blobs:
                n_blobs, size, anchor = 0, 0, -1
            else:
                n_blobs = len(blobs)
                size, anchor = max(blobs, key=lambda b: (b[0], -b[1]))
            rows.append(
                {
                    "doc_id": row["doc_id"], "media_ref": span["media_ref"],
                    "n_fg": np.int64(n_fg), "n_blobs": np.int64(n_blobs),
                    "largest_size": np.int64(size),
                    "largest_anchor": np.int64(anchor),
                }
            )
    cols = ["doc_id", "media_ref", "n_fg", "n_blobs", "largest_size", "largest_anchor"]
    return pd.DataFrame(rows, columns=cols).sort_values(
        ["doc_id", "media_ref"]).reset_index(drop=True)


def oracle_media_quadtree(docs: pa.Table) -> pd.DataFrame:
    """Scalar quadtree recomputation: explicit min/max loops per region
    over the raw pixel spec (no numpy slicing reductions), same split rule
    (h//2 / w//2; 1-wide strips split along the long axis)."""
    thr = 60
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            img = _oracle_media_pixels(span["media_ref"])
            h, w = img.shape[:2]
            g = [
                [int(img[y, x, 0]) + int(img[y, x, 1]) + int(img[y, x, 2])
                 for x in range(w)]
                for y in range(h)
            ]
            stats = {"leaves": 0, "depth": 0, "px": 0, "big": 0}

            def rec(y0, y1, x0, x1, depth):
                mn = mx = g[y0][x0]
                for y in range(y0, y1):
                    for x in range(x0, x1):
                        v = g[y][x]
                        if v < mn:
                            mn = v
                        if v > mx:
                            mx = v
                rh, rw = y1 - y0, x1 - x0
                uniform = mx - mn <= thr
                if uniform or (rh == 1 and rw == 1):
                    stats["leaves"] += 1
                    if depth > stats["depth"]:
                        stats["depth"] = depth
                    if rh == 1 and rw == 1:
                        stats["px"] += 1
                    elif uniform and rh * rw > stats["big"]:
                        stats["big"] = rh * rw
                    return
                ym, xm = y0 + rh // 2, x0 + rw // 2
                if rh > 1 and rw > 1:
                    rec(y0, ym, x0, xm, depth + 1)
                    rec(y0, ym, xm, x1, depth + 1)
                    rec(ym, y1, x0, xm, depth + 1)
                    rec(ym, y1, xm, x1, depth + 1)
                elif rh == 1:
                    rec(y0, y1, x0, xm, depth + 1)
                    rec(y0, y1, xm, x1, depth + 1)
                else:
                    rec(y0, ym, x0, x1, depth + 1)
                    rec(ym, y1, x0, x1, depth + 1)

            rec(0, h, 0, w, 0)
            rows.append(
                {
                    "doc_id": row["doc_id"], "media_ref": span["media_ref"],
                    "n_leaves": np.int64(stats["leaves"]),
                    "max_depth": np.int64(stats["depth"]),
                    "n_px_leaves": np.int64(stats["px"]),
                    "largest_uniform_area": np.int64(stats["big"]),
                }
            )
    cols = ["doc_id", "media_ref", "n_leaves", "max_depth",
            "n_px_leaves", "largest_uniform_area"]
    return pd.DataFrame(rows, columns=cols).sort_values(
        ["doc_id", "media_ref"]).reset_index(drop=True)


def oracle_media_sobel(docs: pa.Table) -> pd.DataFrame:
    """Scalar Sobel recomputation: explicit per-pixel 3×3 loops over the raw
    pixel spec, grayscale = r+g+b, mag² = gx²+gy², threshold 1_000_000 —
    pure python ints (never numpy vector ops), algorithm-diverse from the
    engine's slice arithmetic."""
    thr2 = 1_000_000
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            img = _oracle_media_pixels(span["media_ref"])
            h, w = img.shape[:2]
            g = [
                [int(img[y, x, 0]) + int(img[y, x, 1]) + int(img[y, x, 2]) for x in range(w)]
                for y in range(h)
            ]
            n_int = n_edges = mx = sm = 0
            for y in range(1, h - 1):
                for x in range(1, w - 1):
                    gx = (
                        g[y - 1][x + 1] + 2 * g[y][x + 1] + g[y + 1][x + 1]
                        - g[y - 1][x - 1] - 2 * g[y][x - 1] - g[y + 1][x - 1]
                    )
                    gy = (
                        g[y + 1][x - 1] + 2 * g[y + 1][x] + g[y + 1][x + 1]
                        - g[y - 1][x - 1] - 2 * g[y - 1][x] - g[y - 1][x + 1]
                    )
                    m2 = gx * gx + gy * gy
                    n_int += 1
                    if m2 > thr2:
                        n_edges += 1
                    if m2 > mx:
                        mx = m2
                    sm += m2
            rows.append(
                {
                    "doc_id": row["doc_id"], "media_ref": span["media_ref"],
                    "n_interior": np.int64(n_int), "n_edges": np.int64(n_edges),
                    "max_mag2": np.int64(mx), "sum_mag2": np.int64(sm),
                }
            )
    cols = ["doc_id", "media_ref", "n_interior", "n_edges", "max_mag2", "sum_mag2"]
    return pd.DataFrame(rows, columns=cols).sort_values(
        ["doc_id", "media_ref"]).reset_index(drop=True)


def oracle_media_orient_hist(docs: pa.Table) -> pd.DataFrame:
    """Scalar orientation-histogram recomputation: per-pixel 3×3 Sobel
    loops (python ints), mag² > 1_000_000 edge gate, then the same
    sign/abs-compare octant ladder restated branch by branch."""
    thr2 = 1_000_000
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            img = _oracle_media_pixels(span["media_ref"])
            h, w = img.shape[:2]
            g = [
                [int(img[y, x, 0]) + int(img[y, x, 1]) + int(img[y, x, 2]) for x in range(w)]
                for y in range(h)
            ]
            n_edge = 0
            hist = [0] * 8
            for y in range(1, h - 1):
                for x in range(1, w - 1):
                    gx = (
                        g[y - 1][x + 1] + 2 * g[y][x + 1] + g[y + 1][x + 1]
                        - g[y - 1][x - 1] - 2 * g[y][x - 1] - g[y + 1][x - 1]
                    )
                    gy = (
                        g[y + 1][x - 1] + 2 * g[y + 1][x] + g[y + 1][x + 1]
                        - g[y - 1][x - 1] - 2 * g[y - 1][x] - g[y - 1][x + 1]
                    )
                    if gx * gx + gy * gy <= thr2:
                        continue
                    n_edge += 1
                    ax, ay = abs(gx), abs(gy)
                    if gy >= 0:
                        if gx > 0:
                            o = 0 if ax > ay else 1
                        elif gx == 0:
                            o = 2
                        else:
                            o = 3 if ax > ay else 2
                    else:
                        if gx < 0:
                            o = 4 if ax > ay else 5
                        elif gx == 0:
                            o = 6
                        else:
                            o = 7 if ax > ay else 6
                    hist[o] += 1
            out = {"doc_id": row["doc_id"], "media_ref": span["media_ref"],
                   "n_edge": np.int64(n_edge)}
            for i in range(8):
                out[f"o{i}"] = np.int64(hist[i])
            rows.append(out)
    cols = ["doc_id", "media_ref", "n_edge"] + [f"o{i}" for i in range(8)]
    return pd.DataFrame(rows, columns=cols).sort_values(
        ["doc_id", "media_ref"]).reset_index(drop=True)


def oracle_audio_resample(docs: pa.Table) -> pd.DataFrame:
    """Scalar 2:1 decimation: pairwise mean with FLOOR division (python //)."""
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            s = [int(v) for v in _oracle_audio_samples(span["media_ref"])]
            n = len(s) - (len(s) % 2)
            out = [(s[i] + s[i + 1]) // 2 for i in range(0, n, 2)]
            rows.append(
                {
                    "doc_id": row["doc_id"], "media_ref": span["media_ref"],
                    "n_in": np.int64(len(s)), "n_out": np.int64(len(out)),
                    "sum_sq_out": np.int64(sum(v * v for v in out)),
                    "peak_out": np.int64(max((abs(v) for v in out), default=0)),
                }
            )
    cols = ["doc_id", "media_ref", "n_in", "n_out", "sum_sq_out", "peak_out"]
    return pd.DataFrame(rows, columns=cols).sort_values(
        ["doc_id", "media_ref"]).reset_index(drop=True)


def oracle_media_motion(docs: pa.Table) -> pd.DataFrame:
    """Scalar block-matching recomputation straight from the raw frame spec:
    per-pair, per-8x8-block exhaustive +-2 search with explicit pixel loops;
    out-of-bounds candidates skipped; strict-< keeps the first (dy, dx)."""
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            frames = _oracle_video_frames(span["media_ref"])
            tt, h, w, _ = frames.shape
            gray = [[[int(frames[f, y, x, 0]) + int(frames[f, y, x, 1]) + int(frames[f, y, x, 2])
                      for x in range(w)] for y in range(h)] for f in range(tt)]
            nby, nbx = h // 8, w // 8
            n_pairs = max(tt - 1, 0) if (nby and nbx) else 0
            sum_motion = n_moving = sum_improve = max_improve = 0
            for f in range(1, tt):
                for by in range(nby):
                    for bx in range(nbx):
                        y0, x0 = by * 8, bx * 8
                        best = None
                        best_v = None
                        sad00 = None
                        for dy in range(-2, 3):
                            for dx in range(-2, 3):
                                if y0 + dy < 0 or y0 + dy + 8 > h:
                                    continue
                                if x0 + dx < 0 or x0 + dx + 8 > w:
                                    continue
                                s = 0
                                for i in range(8):
                                    for j in range(8):
                                        s += abs(gray[f - 1][y0 + dy + i][x0 + dx + j]
                                                 - gray[f][y0 + i][x0 + j])
                                if dy == 0 and dx == 0:
                                    sad00 = s
                                if best is None or s < best:
                                    best, best_v = s, (dy, dx)
                        imp = sad00 - best
                        sum_motion += abs(best_v[0]) + abs(best_v[1])
                        n_moving += 1 if best_v != (0, 0) else 0
                        sum_improve += imp
                        max_improve = max(max_improve, imp)
            rows.append(
                {
                    "doc_id": row["doc_id"], "media_ref": span["media_ref"],
                    "n_pairs": np.int32(n_pairs),
                    "n_blocks": np.int64(n_pairs * nby * nbx),
                    "sum_motion": np.int64(sum_motion),
                    "n_moving": np.int64(n_moving),
                    "sum_improve": np.int64(sum_improve),
                    "max_improve": np.int64(max_improve),
                }
            )
    cols = ["doc_id", "media_ref", "n_pairs", "n_blocks", "sum_motion",
            "n_moving", "sum_improve", "max_improve"]
    return pd.DataFrame(rows, columns=cols).sort_values(
        ["doc_id", "media_ref"]).reset_index(drop=True)


def oracle_audio_zcr(docs: pa.Table) -> pd.DataFrame:
    """Scalar ZCR recomputation: explicit per-sample loops over the raw PCM
    spec; transition i-1 -> i owned by sample i's window; first argmax."""
    win, thr, zthr = 256, 92_000_000_000, 64
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            s = [int(v) for v in _oracle_audio_samples(span["media_ref"])]
            nw = len(s) // win
            if nw == 0:
                rows.append({"doc_id": row["doc_id"], "media_ref": span["media_ref"],
                             "n_windows": np.int64(0), "total_zc": np.int64(0),
                             "max_zcr": np.int64(0), "max_zcr_window": np.int64(-1),
                             "n_voiced": np.int64(0)})
                continue
            s = s[: nw * win]
            zcr = [0] * nw
            for i in range(1, len(s)):
                if (s[i - 1] >= 0) != (s[i] >= 0):
                    zcr[i // win] += 1
            energies = [sum(v * v for v in s[i * win:(i + 1) * win]) for i in range(nw)]
            mx = max(zcr)
            n_voiced = sum(1 for e, z in zip(energies, zcr) if e >= thr and z < zthr)
            rows.append(
                {
                    "doc_id": row["doc_id"], "media_ref": span["media_ref"],
                    "n_windows": np.int64(nw), "total_zc": np.int64(sum(zcr)),
                    "max_zcr": np.int64(mx), "max_zcr_window": np.int64(zcr.index(mx)),
                    "n_voiced": np.int64(n_voiced),
                }
            )
    cols = ["doc_id", "media_ref", "n_windows", "total_zc", "max_zcr",
            "max_zcr_window", "n_voiced"]
    return pd.DataFrame(rows, columns=cols).sort_values(
        ["doc_id", "media_ref"]).reset_index(drop=True)


# --- dHash near-dup pairs oracle (scalar; no engine imports) ------------------

def _scalar_dhash_msb(img: np.ndarray) -> int:
    """Scalar dHash spec replay (MSB-first fold, identical to the
    oracle_media_dhash inline loops): 8×9 block-sum grid, adjacent-mean
    compare by cross-multiplication; int64 bit pattern."""
    h, w = img.shape[:2]
    rb = [(i * h) // 8 for i in range(9)]
    cb = [(j * w) // 9 for j in range(10)]
    cell = [[0] * 9 for _ in range(8)]
    for i in range(8):
        for j in range(9):
            s = 0
            for y in range(rb[i], rb[i + 1]):
                for x in range(cb[j], cb[j + 1]):
                    s += int(img[y, x, 0]) + int(img[y, x, 1]) + int(img[y, x, 2])
            cell[i][j] = s
    hv = 0
    for i in range(8):
        ai = rb[i + 1] - rb[i]
        for j in range(8):
            al = ai * (cb[j + 1] - cb[j])
            ar = ai * (cb[j + 2] - cb[j + 1])
            bit = 1 if cell[i][j] * ar > cell[i][j + 1] * al else 0
            hv = (hv << 1) | bit
    return hv - (1 << 64) if hv >= (1 << 63) else hv


def oracle_dhash_pairs(n_imgs: int, max_ham: int = 3) -> pd.DataFrame:
    """Independent replay of the planted near-dup corpus spec (base refs +
    "/v" 2×2 red-MSB-flip variants every 3rd + "/d" duplicates every 5th)
    and a naive O(n²) Hamming sweep over the scalar dHashes."""
    refs = [f"img://dhash/{i}" for i in range(n_imgs)]
    refs += [f"img://dhash/{i}/v" for i in range(0, n_imgs, 3)]
    refs += [f"img://dhash/{i}/d" for i in range(0, n_imgs, 5)]
    hashes = {}
    for ref in refs:
        base = ref[:-2] if ref.endswith(("/v", "/d")) else ref
        img = _oracle_media_pixels(base).copy()
        if ref.endswith("/v"):
            for y in range(2):
                for x in range(2):
                    img[y, x, 0] ^= 0x80
        hashes[ref] = _scalar_dhash_msb(img)
    rows = []
    for i, a in enumerate(refs):
        for b in refs[i + 1:]:
            ham = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            if ham <= max_ham:
                lo, hi = (a, b) if a < b else (b, a)
                rows.append({"ref_a": lo, "ref_b": hi, "ham": ham})
    return (
        pd.DataFrame(rows, columns=["ref_a", "ref_b", "ham"])
        .astype({"ham": "int64"})
        .sort_values(["ref_a", "ref_b"]).reset_index(drop=True)
    )


def oracle_media_hist_eq(docs: pa.Table) -> pd.DataFrame:
    """Scalar histogram-equalization recomputation: per-pixel python-int
    loops build a dict histogram, a sequential running cdf maps each OCCUPIED
    luma level through (cdf − c0) * 765 // (n − c0), and the per-image stats
    are folded value by value — algorithm-diverse from the engine's
    bincount/cumsum LUT."""
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            img = _oracle_media_pixels(span["media_ref"])
            h, w = img.shape[:2]
            hist: dict[int, int] = {}
            for y in range(h):
                for x in range(w):
                    v = int(img[y, x, 0]) + int(img[y, x, 1]) + int(img[y, x, 2])
                    hist[v] = hist.get(v, 0) + 1
            n = h * w
            levels = sorted(hist)
            c0 = hist[levels[0]]
            if n == c0:
                rows.append((row["doc_id"], span["media_ref"], n, 0, 0, 0, 1))
                continue
            cdf = 0
            lo = hi = None
            sum_eq = 0
            seen = set()
            for v in levels:
                cdf += hist[v]
                eq = (cdf - c0) * 765 // (n - c0)
                lo = eq if lo is None else min(lo, eq)
                hi = eq if hi is None else max(hi, eq)
                sum_eq += hist[v] * eq
                seen.add(eq)
            rows.append(
                (row["doc_id"], span["media_ref"], n, lo, hi, sum_eq, len(seen))
            )
    return (
        pd.DataFrame(
            rows,
            columns=["doc_id", "media_ref", "n_pix", "lo", "hi", "sum_eq", "n_levels"],
        )
        .astype({c: "int64" for c in ["n_pix", "lo", "hi", "sum_eq", "n_levels"]})
        .sort_values(["doc_id", "media_ref"]).reset_index(drop=True)
    )


def oracle_media_palette(docs: pa.Table) -> pd.DataFrame:
    """Scalar palette-quantization recomputation: per-pixel python-int L1
    distance to all 8 cube corners with an explicit min scan (smallest index
    on ties — which the odd 255 makes unreachable), algorithm-diverse from
    the engine's per-channel bit test."""
    # index layout must match bit0=r,bit1=g,bit2=b
    corners = [((i & 1) * 255, ((i >> 1) & 1) * 255, ((i >> 2) & 1) * 255)
               for i in range(8)]
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            img = _oracle_media_pixels(span["media_ref"])
            h, w = img.shape[:2]
            counts = [0] * 8
            for y in range(h):
                for x in range(w):
                    r, g, b = (int(img[y, x, 0]), int(img[y, x, 1]),
                               int(img[y, x, 2]))
                    best = None
                    for i, (cr, cg, cb) in enumerate(corners):
                        d = abs(r - cr) + abs(g - cg) + abs(b - cb)
                        if best is None or d < best[0]:
                            best = (d, i)
                    counts[best[1]] += 1
            dom = max(range(8), key=lambda i: (counts[i], -i))
            rows.append((row["doc_id"], span["media_ref"], dom, *counts))
    cols = ["doc_id", "media_ref", "dominant"] + [f"c{i}" for i in range(8)]
    return (
        pd.DataFrame(rows, columns=cols)
        .astype({c: "int64" for c in cols[2:]})
        .sort_values(["doc_id", "media_ref"]).reset_index(drop=True)
    )


def oracle_media_otsu(docs: pa.Table) -> pd.DataFrame:
    """Scalar Otsu recomputation: per-pixel python-int dict histogram, then
    an explicit fraction comparison loop over all 766 candidate thresholds
    (Fraction avoids restating the engine's cross-multiplication) —
    algorithm-diverse from the cumsum/argmax path."""
    from fractions import Fraction

    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            img = _oracle_media_pixels(span["media_ref"])
            h, w = img.shape[:2]
            hist: dict[int, int] = {}
            for y in range(h):
                for x in range(w):
                    v = int(img[y, x, 0]) + int(img[y, x, 1]) + int(img[y, x, 2])
                    hist[v] = hist.get(v, 0) + 1
            n = h * w
            s = sum(v * c for v, c in hist.items())
            best_t, best = -1, Fraction(-1)
            wt = st = 0
            for t in range(766):
                c = hist.get(t, 0)
                wt += c
                st += t * c
                if wt == 0 or wt == n:
                    continue
                score = Fraction((n * st - wt * s) ** 2, wt * (n - wt))
                if score > best:
                    best_t, best = t, score
            if best_t < 0:
                lvl = min(hist) if hist else 0
                rows.append((row["doc_id"], span["media_ref"], lvl, 0, 0))
                continue
            n_fg = sum(c for v, c in hist.items() if v > best_t)
            sum_fg = sum(v * c for v, c in hist.items() if v > best_t)
            rows.append((row["doc_id"], span["media_ref"], best_t, n_fg, sum_fg))
    return (
        pd.DataFrame(rows, columns=["doc_id", "media_ref", "thr", "n_fg", "sum_fg"])
        .astype({c: "int64" for c in ["thr", "n_fg", "sum_fg"]})
        .sort_values(["doc_id", "media_ref"]).reset_index(drop=True)
    )


def oracle_image_dup_clusters(n_imgs: int) -> pd.DataFrame:
    """Scalar union-find closure over the independent dHash pair replay:
    path-compressed find with union-by-min-ref, sizes counted per root."""
    pairs = oracle_dhash_pairs(n_imgs)
    parent: dict[str, str] = {}

    def find(r: str) -> str:
        parent.setdefault(r, r)
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    for a, b in zip(pairs["ref_a"], pairs["ref_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = []
    roots: dict[str, list[str]] = {}
    for r in parent:
        roots.setdefault(find(r), []).append(r)
    for root, members in roots.items():
        lo = min(members)
        for m in members:
            rows.append((m, lo, len(members)))
    return (
        pd.DataFrame(rows, columns=["ref", "cluster", "csize"])
        .astype({"csize": "int64"})
        .sort_values(["cluster", "ref"]).reset_index(drop=True)
    )


def oracle_media_crest(docs: pa.Table) -> pd.DataFrame:
    """Scalar crest recomputation: per-sample python-int loop for peak² and
    energy, the same cross-multiplied peak²·N ≥ 4·energy gate."""
    rows = []
    for row in docs.to_pylist():
        for span in row["spans"]:
            if span["kind"] != "media":
                continue
            s = [int(v) for v in _oracle_audio_samples(span["media_ref"])]
            n = len(s)
            peak2 = 0
            energy = 0
            for v in s:
                sq = v * v
                energy += sq
                if sq > peak2:
                    peak2 = sq
            peaky = 1 if n and peak2 * n >= 4 * energy else 0
            rows.append((row["doc_id"], span["media_ref"], n, peak2, energy,
                         peaky))
    return (
        pd.DataFrame(rows, columns=["doc_id", "media_ref", "n_samples",
                                    "peak2", "energy", "peaky"])
        .astype({c: "int64" for c in ["n_samples", "peak2", "energy", "peaky"]})
        .sort_values(["doc_id", "media_ref"]).reset_index(drop=True)
    )
