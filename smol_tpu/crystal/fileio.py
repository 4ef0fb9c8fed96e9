"""Structure file IO: POSCAR (VASP) and CIF reading/writing.

The reference gets structure-file loading for free through pymatgen
(``pymatgen.core.Structure.from_file``, used as the first line of every
reference notebook workflow, e.g. docs/src/notebooks/creating-a-ce.ipynb);
this module provides the equivalent for the native Structure type.

Supported formats:

- **POSCAR / CONTCAR** (VASP 5+): scale factor (incl. negative = target
  volume), species line, selective-dynamics blocks, Direct/Cartesian
  coordinates.
- **CIF**: cell parameters, ``atom_site`` loops with fractional
  coordinates, partial occupancies (disordered sites are merged by
  position), oxidation-state loops (``atom_type_oxidation_number``), and
  P1 expansion through ``symmetry_equiv_pos_as_xyz`` /
  ``space_group_symop_operation_xyz`` loops.

Both parsers are deliberately strict about what they accept and raise
``ValueError`` with the offending line on malformed input.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["read_structure", "write_structure", "from_file", "from_str"]

_SITE_TOL = 1e-4  # frac-coord tolerance for merging CIF partial occupancies


def _structure_cls():
    from smol_tpu.crystal.structure import Structure

    return Structure


def _lattice_cls():
    from smol_tpu.crystal.lattice import Lattice

    return Lattice


def _species(symbol: str):
    from smol_tpu.crystal.species import Species

    return Species.from_str(symbol)


# ---------------------------------------------------------------- POSCAR


def _parse_poscar(text: str):
    lines = [ln.rstrip() for ln in text.splitlines()]
    if len(lines) < 8:
        raise ValueError("POSCAR too short")
    scale = float(lines[1].split()[0])
    matrix = np.array(
        [[float(x) for x in lines[2 + i].split()[:3]] for i in range(3)]
    )
    if scale < 0:  # negative scale = target cell volume (VASP convention)
        vol = abs(np.linalg.det(matrix))
        scale = (-scale / vol) ** (1.0 / 3.0)
    matrix = matrix * scale

    # VASP 5 species line; VASP 4 files (bare counts) are rejected with a
    # clear message since species cannot be inferred
    toks6 = lines[5].split()
    if not toks6 or toks6[0].isdigit():
        raise ValueError(
            "POSCAR without a species line (VASP 4 format) is not "
            "supported; add the element-symbol line above the counts."
        )
    symbols = toks6
    counts = [int(x) for x in lines[6].split()[: len(symbols)]]
    if len(counts) != len(symbols):
        raise ValueError("POSCAR species/count length mismatch")

    idx = 7
    if lines[idx].strip() and lines[idx].strip()[0] in "sS":
        idx += 1  # selective dynamics
    mode = lines[idx].strip()
    if not mode:
        raise ValueError("POSCAR missing coordinate-mode line")
    cartesian = mode[0] in "cCkK"
    idx += 1

    n = sum(counts)
    coord_lines = [ln for ln in lines[idx:] if ln.strip()]
    if len(coord_lines) < n:
        raise ValueError(f"POSCAR expects {n} coordinate rows")
    coords = np.zeros((n, 3))
    species = []
    row = 0
    for sym, cnt in zip(symbols, counts):
        for _ in range(cnt):
            toks = coord_lines[row].split()
            coords[row] = [float(x) for x in toks[:3]]
            species.append(_species(sym))
            row += 1
    lattice = _lattice_cls()(matrix)
    if cartesian:
        frac = lattice.get_fractional_coords(coords * scale)
    else:
        frac = coords
    return _structure_cls()(lattice, species, frac)


def _write_poscar(structure) -> str:
    if not structure.is_ordered:
        raise ValueError("POSCAR cannot represent disordered structures")
    # group consecutive same-symbol runs (standard POSCAR layout)
    syms = [site.specie.symbol for site in structure]
    order = sorted(range(len(syms)), key=lambda i: (syms[i], i))
    grouped_syms, counts = [], []
    for i in order:
        if grouped_syms and grouped_syms[-1] == syms[i]:
            counts[-1] += 1
        else:
            grouped_syms.append(syms[i])
            counts.append(1)
    lines = [
        " ".join(grouped_syms),
        "1.0",
        *(
            " ".join(f"{x:.10f}" for x in row)
            for row in structure.lattice.matrix
        ),
        " ".join(grouped_syms),
        " ".join(str(c) for c in counts),
        "direct",
    ]
    frac = structure.frac_coords
    for i in order:
        lines.append(
            " ".join(f"{x:.10f}" for x in frac[i]) + f" {syms[i]}"
        )
    return "\n".join(lines) + "\n"


# ------------------------------------------------------------------- CIF


def _cif_strip(value: str) -> str:
    value = value.strip()
    if len(value) >= 2 and value[0] == value[-1] and value[0] in "'\"":
        value = value[1:-1]
    return value


def _cif_float(value: str) -> float:
    """CIF numeric with optional ``(esd)`` suffix."""
    value = _cif_strip(value)
    m = re.match(r"^([-+0-9.eEdD]+)(\(\d+\))?$", value)
    if not m:
        raise ValueError(f"not a CIF number: {value!r}")
    return float(m.group(1).replace("d", "e").replace("D", "e"))


def _cif_tokens(line: str):
    """Split a CIF data line honoring quoted strings."""
    return [
        t[0] or t[1] or t[2]
        for t in re.findall(r"'([^']*)'|\"([^\"]*)\"|(\S+)", line)
    ]


def _parse_cif_blocks(text: str):
    """One dict of tag -> value plus loop tables, first data block only."""
    lines = [
        ln for ln in text.splitlines()
        if ln.strip() and not ln.lstrip().startswith("#")
    ]
    tags = {}
    loops = []  # (headers, rows)
    i = 0
    while i < len(lines):
        ln = lines[i].strip()
        low = ln.lower()
        if low.startswith("data_") and tags:
            break  # only the first data block
        if low.startswith("loop_"):
            i += 1
            headers = []
            while i < len(lines) and lines[i].strip().startswith("_"):
                headers.append(lines[i].split()[0].strip().lower())
                i += 1
            rows = []
            while i < len(lines):
                s = lines[i].strip()
                if s.startswith(("_", "loop_", "data_")) or s.lower().startswith(
                    "loop_"
                ):
                    break
                if s.startswith(";"):  # multi-line text field: skip block
                    i += 1
                    while i < len(lines) and not lines[i].startswith(";"):
                        i += 1
                    i += 1
                    continue
                toks = _cif_tokens(s)
                # continuation rows: CIF values may wrap lines
                while len(toks) < len(headers) and i + 1 < len(lines):
                    nxt = lines[i + 1].strip()
                    if nxt.startswith(("_", "loop_", "data_", ";")):
                        break
                    i += 1
                    toks += _cif_tokens(nxt)
                if len(toks) != len(headers):
                    raise ValueError(f"CIF loop row mismatch: {s!r}")
                rows.append(dict(zip(headers, toks)))
                i += 1
            loops.append((headers, rows))
            continue
        if ln.startswith("_"):
            toks = _cif_tokens(ln)
            key = toks[0].lower()
            if len(toks) >= 2:
                tags[key] = " ".join(toks[1:])
            elif i + 1 < len(lines) and lines[i + 1].startswith(";"):
                # multi-line value: take the first line only
                i += 1
                val = lines[i][1:].strip()
                while i + 1 < len(lines) and not lines[i + 1].startswith(";"):
                    i += 1
                    val += " " + lines[i].strip()
                i += 1
                tags[key] = val
            i += 1
            continue
        i += 1
    return tags, loops


def _parse_symop(xyz: str):
    """Parse 'x,y+1/2,-z' into (rotation 3x3, translation 3)."""
    rot = np.zeros((3, 3))
    trans = np.zeros(3)
    parts = xyz.lower().replace(" ", "").split(",")
    if len(parts) != 3:
        raise ValueError(f"bad symmetry op: {xyz!r}")
    for r, part in enumerate(parts):
        for term in re.findall(r"[+-]?[^+-]+", part):
            sign = -1.0 if term.startswith("-") else 1.0
            term = term.lstrip("+-")
            if term in ("x", "y", "z"):
                rot[r, "xyz".index(term)] += sign
            elif "/" in term:
                num, den = term.split("/")
                trans[r] += sign * float(num) / float(den)
            elif re.fullmatch(r"[0-9.]+[xyz]", term):
                coef, axis = term[:-1], term[-1]
                rot[r, "xyz".index(axis)] += sign * float(coef)
            else:
                trans[r] += sign * float(term)
    return rot, trans


def _parse_cif(text: str):
    tags, loops = _parse_cif_blocks(text)
    try:
        lattice = _lattice_cls().from_parameters(
            _cif_float(tags["_cell_length_a"]),
            _cif_float(tags["_cell_length_b"]),
            _cif_float(tags["_cell_length_c"]),
            _cif_float(tags["_cell_angle_alpha"]),
            _cif_float(tags["_cell_angle_beta"]),
            _cif_float(tags["_cell_angle_gamma"]),
        )
    except KeyError as err:
        raise ValueError(f"CIF missing cell tag {err}") from err

    # oxidation states by type label, when declared
    oxi = {}
    for headers, rows in loops:
        if "_atom_type_oxidation_number" in headers:
            for row in rows:
                sym = row.get("_atom_type_symbol")
                if sym:
                    oxi[_cif_strip(sym)] = _cif_float(
                        row["_atom_type_oxidation_number"]
                    )

    # symmetry operations (default: identity / P1)
    ops = [(np.eye(3), np.zeros(3))]
    for headers, rows in loops:
        for key in (
            "_symmetry_equiv_pos_as_xyz",
            "_space_group_symop_operation_xyz",
        ):
            if key in headers:
                ops = [_parse_symop(_cif_strip(row[key])) for row in rows]
                break

    site_rows = None
    for headers, rows in loops:
        if "_atom_site_fract_x" in headers:
            site_rows = rows
            break
    if site_rows is None:
        raise ValueError("CIF has no _atom_site_fract_* loop")

    def row_species(row):
        from smol_tpu.crystal.species import Species

        raw = _cif_strip(
            row.get("_atom_site_type_symbol")
            or row.get("_atom_site_label")
            or ""
        )
        if not raw:
            raise ValueError("CIF atom row lacks a type symbol/label")
        m = re.match(r"^([A-Z][a-z]?)", raw)
        if m is None:
            raise ValueError(f"cannot read element from {raw!r}")
        if raw in oxi and not re.search(r"[+-]", raw):
            # bare symbol with a declared oxidation number
            return Species(m.group(1), oxi[raw])
        # strip trailing digits of pure labels like "Fe1"; keep charge
        # strings like "Fe2+" / "O2-" intact
        if re.fullmatch(r"[A-Z][a-z]?\d*", raw):
            raw = m.group(1)
        return _species(raw)

    # apply symmetry to build the P1 site list, merging duplicates
    positions = []  # frac coords
    comps = []  # {Species: occupancy}
    for row in site_rows:
        base = np.array(
            [
                _cif_float(row["_atom_site_fract_x"]),
                _cif_float(row["_atom_site_fract_y"]),
                _cif_float(row["_atom_site_fract_z"]),
            ]
        )
        occup = (
            _cif_float(row["_atom_site_occupancy"])
            if "_atom_site_occupancy" in row
            else 1.0
        )
        sp = row_species(row)
        for rot, trans in ops:
            fc = np.mod(rot @ base + trans, 1.0)
            fc = np.mod(fc + 0.5 * _SITE_TOL, 1.0) - 0.5 * _SITE_TOL
            for j, pos in enumerate(positions):
                d = fc - pos
                d -= np.round(d)
                if np.linalg.norm(d) < _SITE_TOL:
                    comps[j][sp] = max(comps[j].get(sp, 0.0), occup)
                    break
            else:
                positions.append(fc)
                comps.append({sp: occup})
    return _structure_cls()(lattice, comps, np.array(positions))


def _write_cif(structure) -> str:
    lat = structure.lattice
    a, b, c = lat.lengths
    alpha, beta, gamma = lat.angles
    lines = [
        "data_structure",
        f"_cell_length_a {a:.8f}",
        f"_cell_length_b {b:.8f}",
        f"_cell_length_c {c:.8f}",
        f"_cell_angle_alpha {alpha:.8f}",
        f"_cell_angle_beta {beta:.8f}",
        f"_cell_angle_gamma {gamma:.8f}",
        "_symmetry_space_group_name_H-M 'P 1'",
        "_symmetry_Int_Tables_number 1",
        "loop_",
        " _symmetry_equiv_pos_as_xyz",
        " 'x, y, z'",
        "loop_",
        " _atom_site_type_symbol",
        " _atom_site_label",
        " _atom_site_occupancy",
        " _atom_site_fract_x",
        " _atom_site_fract_y",
        " _atom_site_fract_z",
    ]
    counter = {}
    for site in structure:
        for sp, amt in site.species.items():
            counter[sp.symbol] = counter.get(sp.symbol, 0) + 1
            label = f"{sp.symbol}{counter[sp.symbol]}"
            fx, fy, fz = site.frac_coords
            lines.append(
                f" {sp} {label} {amt:.6f} {fx:.8f} {fy:.8f} {fz:.8f}"
            )
    return "\n".join(lines) + "\n"


# ------------------------------------------------------------- dispatch


def _guess_format(filename: str, text: str) -> str:
    low = str(filename).lower()
    if low.endswith(".cif"):
        return "cif"
    if low.endswith((".vasp", ".poscar")) or "poscar" in low or "contcar" in low:
        return "poscar"
    # content sniff: CIF files carry data_/_cell tags
    if re.search(r"^\s*(data_|_cell_length_a)", text, re.MULTILINE | re.IGNORECASE):
        return "cif"
    return "poscar"


def from_str(text: str, fmt: str):
    """Parse a structure from a string (``fmt``: 'poscar' or 'cif')."""
    fmt = fmt.lower()
    if fmt in ("poscar", "vasp", "contcar"):
        return _parse_poscar(text)
    if fmt == "cif":
        return _parse_cif(text)
    raise ValueError(f"Unsupported structure format: {fmt!r}")


def from_file(filename):
    """Read a Structure from a POSCAR/CONTCAR or CIF file."""
    with open(filename) as fh:
        text = fh.read()
    return from_str(text, _guess_format(filename, text))


# keep the public read/write names symmetrical
read_structure = from_file


def write_structure(structure, filename, fmt: str | None = None) -> None:
    """Write a Structure to a POSCAR or CIF file (format from extension)."""
    if fmt is None:
        fmt = "cif" if str(filename).lower().endswith(".cif") else "poscar"
    fmt = fmt.lower()
    if fmt == "cif":
        text = _write_cif(structure)
    elif fmt in ("poscar", "vasp", "contcar"):
        text = _write_poscar(structure)
    else:
        raise ValueError(f"Unsupported structure format: {fmt!r}")
    with open(filename, "w") as fh:
        fh.write(text)
