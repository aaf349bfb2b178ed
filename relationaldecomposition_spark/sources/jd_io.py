"""JD (.sep) file serialization — the handoff format between the mining
stage and the schema-enumeration stage.

Wire-compatible with the reference:
`search/MinimalJDGenerator.printJDsToFile:877-901` writes
``<numAtts>,{{4, 9}|{1},{6, 11},{3}},<measure>`` per line (positional
attribute indices); `search/AcyclicSchemaEnumerator.JDFromLine:156-218`
parses it back. Our attribute sets are named columns, so both directions
take the schema column list and map name <-> position.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Sequence

from ..core.deps import JD

_COMPONENT_RE = re.compile(r"\{(.*?)\}")


def _set_to_idx(s: frozenset[str], pos: dict[str, int]) -> str:
    return "{" + ", ".join(str(i) for i in sorted(pos[c] for c in s)) + "}"


def _idx_to_set(body: str, schema: Sequence[str]) -> frozenset[str]:
    body = body.strip()
    if not body:
        return frozenset()
    return frozenset(schema[int(tok.strip())] for tok in body.split(","))


def jd_to_line(jd: JD, schema: Sequence[str]) -> str:
    pos = {c: i for i, c in enumerate(schema)}
    comps = ",".join(_set_to_idx(c, pos)
                     for c in sorted(jd.components, key=lambda c: sorted(pos[x] for x in c)))
    if jd.measure.is_exact:
        measure = jd.measure.value
    elif jd.measure.upper != float("inf"):
        measure = jd.measure.upper  # serialize the proven bound
    else:
        raise ValueError(f"JD must be measured before serialization: {jd}")
    return f"{len(schema)},{{{_set_to_idx(jd.lhs, pos)}|{comps}}},{measure}"


def jd_from_line(line: str, schema: Sequence[str]) -> JD:
    """Parse one reference-format line (JDFromLine semantics: first '{' to
    last '}' is the JD body, lhs before '|', regex-extracted components,
    trailing comma-field is the measure)."""
    num_atts = int(line.split(",", 1)[0].strip())
    if num_atts != len(schema):
        raise ValueError(f"line declares {num_atts} attributes, "
                         f"schema has {len(schema)}")
    try:
        first = line.index("{")
        last = line.rindex("}")
        body = line[first + 1:last]       # {4, 9}|{1},{6, 11},{3}
        bar = body.index("|")
    except ValueError as e:
        raise ValueError(f"malformed JD line (expected "
                         f"'n,{{{{lhs}}|{{c1}},...}},measure'): {line!r}") from e
    lhs_str = body[:bar].strip()
    lhs = _idx_to_set(lhs_str[1:-1], schema)
    comps = frozenset(_idx_to_set(m.group(1), schema)
                      for m in _COMPONENT_RE.finditer(body[bar + 1:]))
    jd = JD(lhs, comps)
    measure = float(line[line.rindex(",") + 1:].strip())
    jd.measure.set_value(max(measure, 0.0))
    return jd


def write_jds(jds: Iterable[JD], path: str, schema: Sequence[str]) -> int:
    n = 0
    with open(path, "w") as f:
        for jd in jds:
            f.write(jd_to_line(jd, schema) + "\n")
            n += 1
    return n


def read_jds(path: str, schema: Sequence[str]) -> list[JD]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(jd_from_line(line, schema))
    return out
