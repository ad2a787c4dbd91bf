"""Shared helper: own a named appendix section of docs/QUALITY.md.

The main table body is owned by examples/od_quality_table.py, which
preserves everything below the ``<!-- appendix -->`` marker. Each
auxiliary evaluation script (suod stages, stress grid) maintains its own
``<!-- section:NAME -->`` block inside that appendix via
:func:`write_section`, so re-running any one script never clobbers the
others' results.
"""

from pathlib import Path

MARKER = "<!-- appendix -->"


def write_section(path, name: str, text: str) -> None:
    """Replace (or append) the named section in the doc's appendix."""
    path = Path(path)
    start = f"<!-- section:{name} -->"
    end = f"<!-- /section:{name} -->"
    body = path.read_text() if path.exists() else ""
    if MARKER not in body:
        body = body.rstrip() + f"\n\n{MARKER}\n"
    head, appendix = body.split(MARKER, 1)
    if start in appendix and end in appendix:
        before = appendix.split(start, 1)[0]
        after = appendix.split(end, 1)[1]
        appendix = before + start + "\n" + text.strip() + "\n" + end + after
    else:
        appendix = (appendix.rstrip() + "\n\n" + start + "\n" + text.strip()
                    + "\n" + end + "\n")
    path.write_text(head + MARKER + appendix)
