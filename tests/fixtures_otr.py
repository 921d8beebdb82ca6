"""Offline ingest-format fixtures (FIXTURES.md §B): miniature CSV and
HTML inputs shaped exactly like the reference's raw sources, so the
full §3.1 lifecycle runs without network."""

from __future__ import annotations

EPG_HEADER = (
    "Id;beginn;ende;dauer;sender;titel;typ;text;genre_id;fsk;language;"
    "weekday;zusatz;wdh;downloadlink;infolink;programlink"
)


def genres_csv() -> str:
    rows = ["Nummer;Kategorie", "1;Spielfilm", "2;Serie", "3;Doku"]
    return "\n".join(rows) + "\n"


def epg_csv(rows: list[dict]) -> str:
    """rows: dicts with any of the EPG fields; absent → ''."""
    fields = EPG_HEADER.split(";")
    out = [EPG_HEADER]
    for r in rows:
        out.append(";".join(str(r.get(f, "")) for f in fields))
    return "\n".join(out) + "\n"


def toplist_html(rows: list[dict]) -> str:
    """rows: dicts with epg_id, date (dd.MM.yy), rating, preview.
    Builds the 11 marker-separated cells the extractor indexes into
    (reference parse: otrrentetl/server/etl.py:130-138)."""
    marker = '<td oncontextmenu="showNewTabMenu('
    blocks = []
    for r in rows:
        cells = [""] * 11
        cells[0] = f"{r['epg_id']},'x')\">open</td>"
        cells[3] = f"0)\">{r['date']}</td>"
        cells[7] = f"0)\" title='Beliebtheit: {r['rating']}'>pop</td>"
        cells[9] = f"0)\"><img src={r['preview']} width=120></td>"
        for i in range(11):
            if not cells[i]:
                cells[i] = f"0)\">c{i}</td>"
        blocks.append(
            f"<tr id='serchrow{r['epg_id']}' class='row'>" + marker + marker.join(cells)
        )
    return "<html><table>" + "".join(blocks) + "</table></html>"


def tracker_html(rows: list[dict]) -> str:
    """rows: dicts with link, file, finished, loading, loaded.
    Builds the bordertable the extractor slices (reference parse:
    otrrentetl/server/etl.py:181-194)."""
    trs = ["<tr><th>head</th><td>x</td></tr>"]
    for r in rows:
        trs.append(
            "<tr>"
            f"<td>#</td>"
            f"<td><a href='{r['link']}'>{r['file']}</a></td>"
            f"<td align=center>{r['finished']}</td>"
            f"<td align=center>{r['loading']}</td>"
            f"<td align=center>{r['loaded']}</td>"
            "</tr>"
        )
    return (
        "<html><table border=1 class=\"bordertable\">"
        + "".join(trs)
        + "</table></html>"
    )
