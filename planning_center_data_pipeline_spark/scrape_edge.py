"""Web-scrape edge adapter (SURVEY.md §2.1 S6/S7 + §2.3 F7).

The reference's count scrape (reference webscraper.py:15-62) drives a
Selenium session — login form, TOTP second factor, wait, page_source —
then extracts per-list member counts from the DOM (:64-77) and keeps
only "Youth" lists.  The browser is permanently an edge (no network or
chromedriver in the sandbox), but everything AROUND it is engine-
testable and lives here:

- ``totp_now``: RFC 6238 TOTP from the stdlib (hmac/struct) — the F7
  row SURVEY originally scoped out, implemented against the RFC test
  vectors rather than pyotp.
- ``login_and_get_page``: the reference's driver choreography (email,
  password, commit, code, commit, page_source) against a
  webdriver-shaped duck type, so tests inject a fake driver and a
  production deployment passes a real selenium Remote.
- ``extract_list_counts``: the DOM extract via stdlib html.parser —
  same selectors (div.list-item--index-card card, unclassed span for
  the name, div.count badge for the count) and the same "Youth"-only
  quirk (:75-77).
- ``expected_counts_df``: lands the scrape as the `expected_counts`
  DataFrame the in-engine count validation (J4) consumes.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import struct
import time as _time
from html.parser import HTMLParser


def totp_now(
    secret_b32: str,
    at: int | None = None,
    digits: int = 6,
    period: int = 30,
    algo: str = "sha1",
) -> str:
    """RFC 6238 TOTP (RFC 4226 HOTP over floor(unix/period)): base32
    secret, dynamic truncation, zero-padded decimal.  Stdlib-only;
    pinned to the RFC Appendix B test vectors in pytest."""
    if at is None:
        at = int(_time.time())
    key = base64.b32decode(secret_b32.upper() + "=" * (-len(secret_b32) % 8))
    counter = struct.pack(">Q", int(at) // period)
    mac = hmac.new(key, counter, getattr(hashlib, algo)).digest()
    off = mac[-1] & 0x0F
    code = (struct.unpack(">I", mac[off : off + 4])[0] & 0x7FFFFFFF) % (
        10**digits
    )
    return str(code).zfill(digits)


def login_and_get_page(
    driver,
    url: str,
    user_id: str,
    password: str,
    secret_b32: str,
    at: int | None = None,
) -> str:
    """The reference's exact driver choreography (webscraper.py:30-55):
    open url, fill #email/#password, commit, fill #code with the TOTP,
    commit, return page_source.  Always quits the driver (the
    reference's finally block)."""
    try:
        driver.get(url)
        driver.find_element(by="id", value="email").send_keys(user_id)
        driver.find_element(by="id", value="password").send_keys(password)
        driver.find_element(by="name", value="commit").click()
        code_field = driver.find_element(by="id", value="code")
        code_field.send_keys(totp_now(secret_b32, at))
        driver.find_element(by="name", value="commit").click()
        return driver.page_source
    finally:
        driver.quit()


class _ListCardParser(HTMLParser):
    """Extracts (name, count) from the reference's card markup:
    <div class="list-item--index-card d-f">
      <span>NAME</span>
      <div class="count badge badge--subtle">COUNT</div>
    </div>.  A span WITH a class attribute is skipped, exactly like
    the reference's attrs={"class": None} find (webscraper.py:69)."""

    def __init__(self) -> None:
        super().__init__()
        self.cards: list[tuple[str, int]] = []
        self._in_card = 0
        self._name: str | None = None
        self._capture: str | None = None  # 'name' | 'count'
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        cls = a.get("class", "")
        if tag == "div" and "list-item--index-card" in cls:
            self._in_card += 1
            self._name = None
            return
        if not self._in_card:
            return
        if tag == "span" and "class" not in a and self._name is None:
            self._capture, self._buf = "name", []
        elif tag == "div" and "count" in cls and "badge" in cls:
            self._capture, self._buf = "count", []

    def handle_data(self, data):
        if self._capture:
            self._buf.append(data)

    def handle_endtag(self, tag):
        if self._capture == "name" and tag == "span":
            self._name = "".join(self._buf).strip()
            self._capture = None
        elif self._capture == "count" and tag == "div":
            if self._name is not None:
                self.cards.append((self._name, int("".join(self._buf).strip())))
            self._capture = None
        elif tag == "div" and self._in_card and self._capture is None:
            self._in_card = max(self._in_card - 1, 0)


def extract_list_counts(page_html: str) -> dict[str, int]:
    """S7 DOM extract + the reference's Youth-only quirk
    (webscraper.py:75-77): only list names containing "Youth" survive."""
    p = _ListCardParser()
    p.feed(page_html)
    return {name: count for name, count in p.cards if "Youth" in name}


def expected_counts_df(spark, counts: dict[str, int]):
    """Land the scrape as the `expected_counts` DataFrame consumed by
    the in-engine count validation (operators/joins.py J4)."""
    return spark.createDataFrame(
        sorted(counts.items()), "list_name string, expected_count int"
    )


def scrape_expected_counts(
    spark,
    driver,
    url: str,
    user_id: str,
    password: str,
    secret_b32: str,
    at: int | None = None,
):
    """The reference's scrape task end-to-end (login -> DOM extract ->
    counts), landing as a DataFrame instead of a dict."""
    page = login_and_get_page(driver, url, user_id, password, secret_b32, at)
    return expected_counts_df(spark, extract_list_counts(page))
