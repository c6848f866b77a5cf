"""Presentation-layer formatters: points / table / histogram / gnuplot.

Byte-fidelity re-expression of the reference's output path
(bin/dn:972-1274): ``dnOutputRaw`` (--points NDJSON),
``dnOutputPretty`` (fixed-width table via tab-emit),
``dnOutputPrettyQuantized`` + ``dnPrintDistribution`` (DTrace-style
ASCII histograms when the last breakdown is bucketized, including the
empty-bucket zero-fill and the >100-first-bucket skip heuristic at
bin/dn:1166-1174), and ``dnOutputGnuplot``.

This is driver-side work over an already-aggregated (small) result —
the reference runs it on collected rows and so do we; none of it
belongs in the distributed plan.

Our rows carry bucket *minima* directly (the reference carries
ordinals internally and expands at print time, bin/dn:1005-1030); the
histogram printer converts minima back to ordinals to iterate empty
buckets.
"""

from __future__ import annotations

import json
import math
from datetime import datetime, timezone

from dragnet_spark.query import QueryConfig

VALUE_COL = "value"


# ---------------------------------------------------------------- sorting

def _locale_key(v):
    """JS localeCompare-ish: case-insensitive primary, lowercase-first
    tiebreak (bin/dn:988-991 uses String.localeCompare)."""
    if isinstance(v, str):
        return (0, v.lower(), v.swapcase())
    if v is None:
        return (-1, "", "")
    return (1, v, 0) if not isinstance(v, tuple) else v


def _row_key(row):
    out = []
    for v in row:
        if isinstance(v, str):
            out.append((0, v.lower(), v.swapcase()))
        elif v is None:
            out.append((-1, "", ""))
        else:
            out.append((1, float(v), ""))
    return out


def sort_rows(rows: list[tuple]) -> list[tuple]:
    """Column-major total sort: strings locale-ish, numbers numeric
    (reference dnOutputSortRows, bin/dn:980-999)."""
    return sorted(rows, key=_row_key)


# ------------------------------------------------------------- bucketizers

def _p2_ordinal(minimum: int) -> int:
    return 0 if minimum <= 0 else int(math.log2(minimum)) + 1


def _p2_min(ordinal: int) -> int:
    return 0 if ordinal == 0 else 2 ** (ordinal - 1)


def _iso(seconds: int) -> str:
    dt = datetime.fromtimestamp(int(seconds), tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.000Z")


# ---------------------------------------------------------------- points

def format_points(rows: list[tuple], query: QueryConfig) -> list[str]:
    """--points output: one NDJSON skinner point per row (bin/dn:972-975).
    Emitted in sorted order (the reference emits hash order; sorted is
    deterministic and carries the same data)."""
    names = [b.name for b in query.breakdowns]
    out = []
    for row in sort_rows(rows):
        fields = dict(zip(names, row))
        out.append(
            json.dumps(
                {"fields": fields, "value": row[-1]}, separators=(",", ":")
            )
        )
    return out


# ----------------------------------------------------------------- table

def format_table(rows: list[tuple], query: QueryConfig) -> str:
    """Fixed-width table (dnOutputPretty, bin/dn:1035-1090): uppercase
    headers, left-aligned strings, right-aligned numbers, single-space
    separators; expands date columns to ISO-8601."""
    coldefs = list(query.breakdowns)
    quantized = bool(coldefs) and coldefs[-1].bucketized
    if quantized:
        return format_histogram(rows, query)

    rows = [_expand_row(r, query) for r in rows]

    labels = [b.name.upper() for b in coldefs] + ["VALUE"]
    ncols = len(labels)
    widths = [len(lbl) for lbl in labels]
    align_right = [False] * (ncols - 1) + [True]

    if not rows:
        return ""

    for row in rows:
        for j in range(ncols):
            if isinstance(row[j], (int, float)):
                align_right[j] = True
            widths[j] = max(widths[j], len(str(row[j])))

    def fmt_line(vals):
        cells = []
        for j, v in enumerate(vals):
            s = str(v)
            cells.append(s.rjust(widths[j]) if align_right[j] else s.ljust(widths[j]))
        return " ".join(cells).rstrip()

    lines = [fmt_line(labels)]
    for row in sort_rows(rows):
        lines.append(fmt_line(row))
    return "\n".join(lines) + "\n"


def _expand_row(row, query: QueryConfig):
    """Replace date column values with ISO strings (dnOutputExpandValues,
    bin/dn:1005-1030); the last column is left alone when it is the
    bucketized histogram axis."""
    coldefs = list(query.breakdowns)
    quantized = bool(coldefs) and coldefs[-1].bucketized
    out = list(row)
    for j, c in enumerate(coldefs):
        if quantized and j == len(coldefs) - 1:
            continue
        if c.date and out[j] is not None:
            out[j] = _iso(out[j])
    return tuple(out)


# -------------------------------------------------------------- histogram

def format_histogram(rows: list[tuple], query: QueryConfig) -> str:
    """DTrace-style distribution for a bucketized last breakdown
    (dnOutputPrettyQuantized, bin/dn:1092-1141)."""
    coldefs = list(query.breakdowns)
    qcol = coldefs[-1]
    assert qcol.bucketized
    nlead = len(coldefs) - 1

    rows = [_expand_row(r, query) for r in sort_rows(rows)]

    # group consecutive rows by the leading (discrete) columns
    groups: list[tuple[str, list]] = []
    last_key = None
    distr: list = []
    for row in rows:
        key = ", ".join(str(v) for v in row[:nlead]) + "\n"
        if distr and key != last_key:
            groups.append((last_key, distr))
        if key != last_key:
            last_key, distr = key, []
        distr.append((row[nlead], row[nlead + 1]))
    if last_key is not None:
        groups.append((last_key, distr))

    groups.sort(key=lambda g: _locale_key(g[0]))

    out = []
    for i, (label, d) in enumerate(groups):
        if i != 0:
            out.append("\n")
        out.append(label)
        out.append(_distribution(d, qcol))
    return "".join(out)


def _distribution(distr, qcol) -> str:
    """One histogram block (dnPrintDistribution, bin/dn:1144-1199)."""
    asdate = qcol.date
    if qcol.aggr == "quantize":
        to_ord, to_min = _p2_ordinal, _p2_min
    else:
        step = qcol.step or 1
        to_ord = lambda m: int(m) // step          # noqa: E731
        to_min = lambda o: o * step                # noqa: E731

    lines = []
    if asdate:
        lines.append(" " * 10)
    lines.append(" " * 11)
    lines.append("value  ------------- Distribution ------------- count\n")
    if not distr:
        return "".join(lines)

    pairs = [(to_ord(m), c) for m, c in distr if m is not None]
    total = sum(c for _, c in pairs) or 1

    # skip leading empty buckets for large values like timestamps;
    # negative minima (lquantize of negative values) must start at the
    # first ordinal or the zero-fill loop below would never reach them
    bi = pairs[0][0] if (pairs[0][0] > 100 or pairs[0][0] < 0) else 0
    di = 0
    while di < len(pairs) + 1:
        if di == len(pairs):
            count = 0
            di += 1
        elif pairs[di][0] == bi:
            count = pairs[di][1]
            di += 1
        else:
            count = 0
        dots = "@" * int(math.floor(40.0 * count / total + 0.5))
        dots += " " * (40 - len(dots))
        minimum = to_min(bi)
        label = _iso(minimum) if asdate else str(minimum)
        if asdate:
            lines.append("  %24s |%s %s\n" % (label, dots, count))
        else:
            lines.append("%16s |%s %s\n" % (label, dots, count))
        bi += 1
    return "".join(lines)


# --------------------------------------------------------------- gnuplot

def format_gnuplot(rows: list[tuple], query: QueryConfig, title: str) -> str:
    """GNUplot script with inline data (dnOutputGnuplot, bin/dn:1203-1274).
    Only valid for single-breakdown results, like the reference."""
    coldefs = list(query.breakdowns)
    if len(coldefs) != 1:
        raise ValueError("gnuplot output requires exactly one breakdown")
    c = coldefs[0]

    out = [
        "#\n",
        '# This is a GNUplot input file generated automatically\n',
        '# by the Dragnet "dn" command.  You can use it to create\n',
        '# a graph as a PNG image (as file "graph.png") using:\n',
        "#\n",
        "#     gnuplot < this_file > graph.png\n",
        "#\n",
        "set terminal png size 1200,600\n",
        'set title "%s"\n' % title,
    ]
    if c.date:
        out += [
            "# Configure plots to use the x-axis as time.\n",
            "set xdata time;\n",
            'set timefmt "%s";\n',
            'set format x "%m/%d\\n%H:%MZ"\n',
        ]
    out += [
        "# Add 10% padding at the top of the graph.\n",
        "set offsets graph 0, 0, 0.1, 0\n",
        "# The y-axis should always start at zero.\n",
        "set yrange [0:*]\n",
        'set ylabel "Count"\n',
        "set ytics\n",
    ]
    if c.bucketized:
        out.append('plot "-" using 1:2 with linespoints title "Value"\n')
    else:
        out.append(
            'plot "-" using (column(0)):2:xtic(1) with linespoints title "Value"\n'
        )
    for row in sort_rows(rows):
        out.append("\t%s %s\n" % (row[0], row[1]))
    out.append("\te\n")
    return "".join(out)


# ------------------------------------------------------------ entry point

def render(result, query: QueryConfig, mode: str = "table", title: str = "dn") -> str:
    """Collect a scan/query result DataFrame (or accept pre-collected
    row tuples) and format it. Modes: table (histogram auto-selected
    when the last breakdown is bucketized), points, gnuplot."""
    if hasattr(result, "collect"):
        rows = [tuple(r) for r in result.collect()]
    else:
        rows = [tuple(r) for r in result]
    if mode == "points":
        return "\n".join(format_points(rows, query)) + "\n"
    if mode == "raw":
        # --raw: one JSON array of flattened rows (dnOutputRaw,
        # bin/dn:972-975); zero-breakdown results flatten to [count]
        if not query.breakdowns:
            flat = [rows[0][0] if rows else 0]
        else:
            flat = [list(r) for r in sort_rows(rows)]
        return json.dumps(flat, separators=(",", ":")) + "\n"
    if mode == "gnuplot":
        return format_gnuplot(rows, query, title)
    if not query.breakdowns:
        # zero-breakdown scalar: VALUE header + right-aligned count
        v = rows[0][0] if rows else 0
        w = max(5, len(str(v)))
        return "VALUE".rjust(w) + "\n" + str(v).rjust(w) + "\n"
    return format_table(rows, query)
