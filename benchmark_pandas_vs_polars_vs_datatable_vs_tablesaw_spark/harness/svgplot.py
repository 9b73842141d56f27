"""Stdlib SVG bar charts — the H7 fallback renderer.

The reference renders its engine comparison with matplotlib
(`NB-main` cells 6-7); this container has no matplotlib, so H7 needs
a dependency-free path that still produces a committed artifact.

Design notes (kept deliberately boring and legible):
- Small multiples, one panel per operation, each with its own LINEAR
  scale — the op timings span 0.18s..66s, and log-scaled bar lengths
  lie about magnitude, while per-panel linear scales don't.
- Identity is carried by the row label text, not by color: bars are a
  de-emphasis neutral with one accent for the highlighted engine, and
  every bar carries a visible value label (relief for the low-contrast
  neutral). No legend needed — a one-line note names the accent.
- Marks: thin horizontal bars, rounded only at the data end, 2px
  surface gap between rows, recessive axis line.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK_2 = "#52514e"
AXIS = "#e4e2dc"
NEUTRAL = "#99968d"
ACCENT = "#2a78d6"

_FONT = "system-ui, -apple-system, 'Segoe UI', sans-serif"

_LABEL_W = 64
_BAR_W = 96
_VALUE_W = 52
_ROW_H = 22
_BAR_H = 14
_PANEL_GAP = 18


def _fmt(v: float) -> str:
    if v >= 100:
        return f"{v:.0f}"
    if v >= 10:
        return f"{v:.1f}"
    return f"{v:.2f}"


def _bar_path(x: float, y: float, w: float, h: float, r: float) -> str:
    """Horizontal bar anchored square at the baseline (left), rounded
    only at the data end (right) — the mark spec's 4px data-end."""
    r = min(r, w / 2, h / 2)
    return (
        f"M{x:.1f},{y:.1f} h{w - r:.1f} q{r:.1f},0 {r:.1f},{r:.1f} "
        f"v{h - 2 * r:.1f} q0,{r:.1f} -{r:.1f},{r:.1f} h-{w - r:.1f} z"
    )


def render_bar_panels(
    panels: list[tuple[str, list[tuple[str, float, bool]]]],
    path: str,
    title: str,
    subtitle: str = "",
    note: str = "",
) -> str:
    """Write a small-multiples horizontal-bar SVG.

    panels: [(panel_title, [(row_label, value, is_accent), ...]), ...]
    Returns the path written. Pure stdlib; deterministic output.
    """
    panel_w = _LABEL_W + _BAR_W + _VALUE_W
    n_rows = max((len(rows) for _, rows in panels), default=0)
    top = 30 + (18 if subtitle else 0)
    panel_top = top + 24
    rows_h = n_rows * _ROW_H
    note_h = 26 if note else 8
    width = 16 + len(panels) * panel_w + (len(panels) - 1) * _PANEL_GAP + 16
    height = panel_top + rows_h + 10 + note_h

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}" role="img" '
        f'aria-label="{escape(title, {chr(34): "&quot;"})}">',
        f'<rect width="{width}" height="{height}" fill="{SURFACE}"/>',
        f'<text x="16" y="22" font-family="{_FONT}" font-size="14" '
        f'font-weight="600" fill="{INK}">{escape(title)}</text>',
    ]
    if subtitle:
        parts.append(
            f'<text x="16" y="40" font-family="{_FONT}" font-size="11" '
            f'fill="{INK_2}">{escape(subtitle)}</text>'
        )
    for i, (ptitle, rows) in enumerate(panels):
        px = 16 + i * (panel_w + _PANEL_GAP)
        vmax = max((v for _, v, _ in rows), default=1.0) or 1.0
        parts.append(
            f'<text x="{px + _LABEL_W}" y="{panel_top - 8}" font-family="{_FONT}" '
            f'font-size="12" font-weight="600" fill="{INK}">{escape(ptitle)}</text>'
        )
        # recessive baseline for the bar track
        x0 = px + _LABEL_W
        parts.append(
            f'<line x1="{x0}" y1="{panel_top - 2}" x2="{x0}" '
            f'y2="{panel_top + rows_h - 4}" stroke="{AXIS}" stroke-width="1"/>'
        )
        for j, (label, value, is_accent) in enumerate(rows):
            y = panel_top + j * _ROW_H
            by = y + (_ROW_H - 2 - _BAR_H) / 2  # 2px surface gap between rows
            bw = max(2.0, _BAR_W * value / vmax)
            fill = ACCENT if is_accent else NEUTRAL
            weight = "600" if is_accent else "400"
            parts.append(
                f'<text x="{x0 - 6}" y="{by + _BAR_H - 3}" text-anchor="end" '
                f'font-family="{_FONT}" font-size="11" font-weight="{weight}" '
                f'fill="{INK_2}">{escape(label)}</text>'
            )
            parts.append(
                f'<path d="{_bar_path(x0, by, bw, _BAR_H, 4)}" fill="{fill}">'
                f"<title>{escape(f'{ptitle} — {label}: {value:g}s')}</title></path>"
            )
            parts.append(
                f'<text x="{x0 + bw + 5}" y="{by + _BAR_H - 3}" '
                f'font-family="{_FONT}" font-size="11" fill="{INK}">'
                f"{_fmt(value)}</text>"
            )
    if note:
        parts.append(
            f'<text x="16" y="{height - 10}" font-family="{_FONT}" '
            f'font-size="10.5" fill="{INK_2}">{escape(note)}</text>'
        )
    parts.append("</svg>")
    svg = "\n".join(parts)
    with open(path, "w") as f:
        f.write(svg)
    return path
