"""Google-Sheets edge adapter (SURVEY.md §2.8 K3/K4/K5).

The reference's sheet work (reference google_sheets.py:33-60 import_csv
upload + formula refresh, :64-94 values-only range copy) is pure
side-effect on an external service — it stays OUT of the engine.  This
adapter is the seam: it takes the ENGINE's outputs (rendered CSV text,
a presentation DataFrame slice) and drives a gspread-shaped client with
exactly the reference's API calls, so a production deployment passes a
real `gspread.authorize(...)` client and tests pass a fake that records
and applies the calls.

Client duck-type (the subset of gspread the reference uses):
    client.open(name) -> spreadsheet
    client.import_csv(spreadsheet.id, data=csv_text)
    client.list_spreadsheet_files() -> [{"name": ...}, ...]
    spreadsheet.worksheet(tab)._properties["sheetId"] -> int
    spreadsheet.batch_update(body)

No gspread import here — the adapter only speaks the protocol.
"""

from __future__ import annotations

FORMULA_REFRESH_BODY = {
    "requests": [
        {
            "findReplace": {
                "find": "=",
                "includeFormulas": True,
                "allSheets": True,
                "replacement": "=",
            }
        }
    ]
}


def upload_csvs(client, csv_data: dict[str, str]) -> list[str]:
    """K3: push each rendered CSV into the spreadsheet of the same name
    (reference google_sheets.py:33-37 loop).  `csv_data` is the engine's
    per-list CSV rendering (operators/pipeline.py K1) — name -> text.
    Returns the uploaded names in call order."""
    done = []
    for csv_name, csv_content in csv_data.items():
        spreadsheet = client.open(csv_name)
        client.import_csv(spreadsheet.id, data=csv_content)
        done.append(csv_name)
    return done


def refresh_formulas(client, master_name: str) -> None:
    """K4: the reference's formula-refresh trick — findReplace '=' with
    '=' across all sheets, includeFormulas=True, which forces Sheets to
    re-evaluate every formula (google_sheets.py:46-60).  Pure
    side-effect; the body is a module constant so tests can assert the
    exact request."""
    client.open(master_name).batch_update(FORMULA_REFRESH_BODY)


def copy_range_values(
    client,
    master_name: str,
    source_tab: str,
    dest_tab: str,
    start_row: int = 2,
    end_row: int = 500,
    start_col: int = 0,
    end_col: int = 5,
) -> dict:
    """K5 edge half: the values-only copyPaste from the reference tab to
    the destination tab (google_sheets.py:64-94; source skips header +
    description rows, destination skips header, PASTE_VALUES).  The
    in-engine half — WHAT those rows contain — is `range_copy`
    (operators/windows.py) / the ref_range_copy plan; this call only
    moves them between tabs.  Returns the request body it sent."""
    spreadsheet = client.open(master_name)
    src_id = spreadsheet.worksheet(source_tab)._properties["sheetId"]
    dst_id = spreadsheet.worksheet(dest_tab)._properties["sheetId"]
    body = {
        "requests": [
            {
                "copyPaste": {
                    "source": {
                        "sheetId": src_id,
                        "startRowIndex": start_row,
                        "endRowIndex": end_row,
                        "startColumnIndex": start_col,
                        "endColumnIndex": end_col,
                    },
                    "destination": {
                        "sheetId": dst_id,
                        "startRowIndex": start_row - 1,
                        "endRowIndex": end_row,
                        "startColumnIndex": start_col,
                        "endColumnIndex": end_col,
                    },
                    "pasteType": "PASTE_VALUES",
                }
            }
        ]
    }
    spreadsheet.batch_update(body)
    return body


def process_google_sheets(
    client,
    csv_data: dict[str, str],
    master_name: str,
    source_tab: str,
    dest_tab: str,
) -> bool:
    """The reference's combined task (google_sheets.py:8-105), edge
    half only: upload every CSV, list files (access check), refresh
    formulas, copy the reference range values — same call order."""
    upload_csvs(client, csv_data)
    client.list_spreadsheet_files()
    refresh_formulas(client, master_name)
    copy_range_values(client, master_name, source_tab, dest_tab)
    return True
