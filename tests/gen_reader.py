"""Deterministic reconstruction of the reference's CSV-reader
generator (tools/gen_reader_test.ml — the build step that emits
tests/func/generated.ramen + fixtures/generated.csv, both absent from
the checkout).

Mirrors the tool's behavior: a random record type (max depth 3:
scalars incl. nullable, fixed vectors, tuples, records — the tool's
``ensure_supported`` set minus variable-length lists, whose
length-prefixed cells give per-row arity), printed in dessser
``DT.print_mn`` syntax inside a ``READ … AS CSV … VECTORS OF CHARS AS
VECTOR`` reader, plus the counter function; data rows flatten each
compound value across cells (``csv_of_vec`` joins with the
separator). Deterministic seed → reproducible corpus.
"""

from __future__ import annotations

import random

NULL_STR = "\\N"
SEP = ","

_SCALARS = [
    ("u8", lambda r: r.randrange(256)),
    ("u16", lambda r: r.randrange(1 << 16)),
    ("u32", lambda r: r.randrange(1 << 32)),
    ("i8", lambda r: r.randrange(-128, 128)),
    ("i16", lambda r: r.randrange(-(1 << 15), 1 << 15)),
    ("i32", lambda r: r.randrange(-(1 << 31), 1 << 31)),
    ("i64", lambda r: r.randrange(-(1 << 40), 1 << 40)),
    ("float", lambda r: round(r.uniform(-1e3, 1e3), 6)),
    ("bool", lambda r: r.random() < 0.5),
    ("string", lambda r: "".join(r.choices("wxyzklmnop_", k=r.randrange(0, 9)))),
    ("char", lambda r: r.choice("abcxyz")),
]

_NAMES = iter(
    f"{a}{b}" for a in "ghjklmnopqrstuvwxyz" for b in "ghjklmnopqrstuvwxyz"
)


def gen_type(rng: random.Random, depth: int):
    """Type tree: ("scalar", name, nullable) | ("vec", dim, elem) |
    ("tuple", [elem…]) | ("rec", [(name, elem)…])."""
    kinds = ["scalar"] * 3 + (["vec", "tuple", "rec"] if depth > 1 else [])
    k = rng.choice(kinds)
    if k == "scalar":
        name, _ = rng.choice(_SCALARS)
        return ("scalar", name, rng.random() < 0.3)
    if k == "vec":
        return ("vec", rng.randrange(2, 5), gen_type(rng, depth - 1))
    if k == "tuple":
        return ("tuple", [gen_type(rng, depth - 1) for _ in range(rng.randrange(2, 4))])
    return ("rec", [(next(_NAMES), gen_type(rng, depth - 1)) for _ in range(rng.randrange(2, 4))])


def print_type(t) -> str:
    """dessser DT.print_mn syntax."""
    if t[0] == "scalar":
        return t[1] + ("?" if t[2] else "")
    if t[0] == "vec":
        return f"{print_type(t[2])}[{t[1]}]"
    if t[0] == "tuple":
        return "(" + "; ".join(print_type(m) for m in t[1]) + ")"
    return "{" + "; ".join(f"{n}: {print_type(m)}" for n, m in t[1]) + "}"


def gen_cells(rng: random.Random, t) -> list[str]:
    """One value → its flattened CSV cells."""
    if t[0] == "scalar":
        name, mk = next(s for s in _SCALARS if s[0] == t[1])
        if t[2] and rng.random() < 0.05:
            return [NULL_STR]
        v = mk(rng)
        if name == "bool":
            return ["true" if v else "false"]
        return [str(v)]
    if t[0] == "vec":
        return [c for _ in range(t[1]) for c in gen_cells(rng, t[2])]
    if t[0] == "tuple":
        return [c for m in t[1] for c in gen_cells(rng, m)]
    return [c for _, m in t[1] for c in gen_cells(rng, m)]


def generate(out_dir, seed: int = 42, rows: int = 100_000, n_fields: int = 4):
    """→ (program_text, first_row_cells): writes generated.csv under
    ``out_dir`` and returns the reader+counter program text, exactly
    the pair the reference's Makefile step produces."""
    import os

    rng = random.Random(seed)
    fields = [(next(_NAMES), gen_type(rng, 3)) for _ in range(n_fields)]
    csv_path = os.path.join(str(out_dir), "generated.csv")
    first: list[str] | None = None
    with open(csv_path, "w") as fh:
        for _ in range(rows):
            cells = [c for _, t in fields for c in gen_cells(rng, t)]
            if first is None:
                first = cells
            fh.write(SEP.join(cells) + "\n")
    lines = [
        "DEFINE 'reader' AS",
        # the RaQL string literal needs the backslash escaped
        f'  READ FROM FILE "{csv_path}" AS CSV SEPARATOR "{SEP}" '
        f'NULL "{NULL_STR.replace(chr(92), chr(92) * 2)}" ',
        "  VECTORS OF CHARS AS VECTOR (",
    ]
    for i, (n, t) in enumerate(fields):
        comma = "" if i == len(fields) - 1 else ","
        lines.append(f"    '{n}' {print_type(t)}{comma}")
    lines.append("  );")
    lines.append("")
    lines.append(
        "DEFINE counter AS SELECT *, SUM globally 1 AS count FROM reader;"
    )
    return "\n".join(lines) + "\n", fields, first
