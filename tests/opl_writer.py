"""Independent spec-following OPL encoder for round-trip tests.

Written against the published osmium OPL format description only — shares
no code with sources/osm_opl.py (the reader under test). Escapes the
spec's special set (space/newline/CR/tab/comma/=/@/% and all control
chars) as "%" + lowercase-hex codepoint + "%".
"""

from __future__ import annotations

_SPECIAL = set(' \n\r\t,=@%')


def _esc(s: str) -> str:
    out = []
    for ch in s:
        if ch in _SPECIAL or ord(ch) < 0x21:
            out.append(f"%{ord(ch):x}%")
        else:
            out.append(ch)
    return "".join(out)


def encode_opl(ents, *, with_noise_fields: bool = True) -> bytes:
    """Entities (parse_entities dicts) → OPL bytes. ``with_noise_fields``
    adds version/changeset/uid/user fields the docs model ignores, so the
    round-trip also proves the reader skips them."""
    lines = []
    for e in ents:
        etype = e["etype"]
        parts = [f"{etype[0]}{e['id']}"]
        if with_noise_fields:
            parts += ["v1", "dV", "c42", "i7", "u" + _esc("test user")]
        if e.get("lastchange"):
            parts.append("t" + e["lastchange"])
        if e["tags"]:
            parts.append(
                "T" + ",".join(
                    f"{_esc(k)}={_esc(v)}" for k, v in e["tags"].items()
                )
            )
        if etype == "node":
            parts.append(f"x{e['lon']:.7f}")
            parts.append(f"y{e['lat']:.7f}")
        elif etype == "way":
            if e["refs"]:
                parts.append("N" + ",".join(f"n{r}" for r in e["refs"]))
        elif etype == "relation":
            parts.append("Mn1@role")
        lines.append(" ".join(parts))
    return ("\n".join(lines) + "\n").encode("utf-8")
