"""Browser-driven SSO scraper with an injected fake WebDriver
(selenium is absent from this image; the driver surface is the contract)."""

import pytest

from archi_tpu.data.catalog import CatalogService
from archi_tpu.data.collectors.sso import (
    BrowserSSOScraper, form_login, selenium_available,
)
from archi_tpu.data.persistence import PersistenceService


class FakeElement:
    def __init__(self, href=None):
        self._href = href
        self.typed = []
        self.clicked = False

    def get_attribute(self, name):
        return self._href

    def send_keys(self, text):
        self.typed.append(text)

    def click(self):
        self.clicked = True


class FakeDriver:
    """Implements the driver surface BrowserSSOScraper uses."""

    def __init__(self, pages):
        self.pages = pages  # url -> (html, [links])
        self.url = None
        self.visited = []
        self.quit_called = False
        self.login_elements = {
            "input[name=username]": FakeElement(),
            "input[name=password]": FakeElement(),
            "button[type=submit]": FakeElement(),
        }

    def get(self, url):
        self.url = url
        self.visited.append(url)

    @property
    def page_source(self):
        return self.pages.get(self.url, ("<html>404</html>", []))[0]

    def find_elements(self, by, selector):
        if selector in self.login_elements:
            return [self.login_elements[selector]]
        links = self.pages.get(self.url, ("", []))[1]
        return [FakeElement(href=u) for u in links]

    def quit(self):
        self.quit_called = True


@pytest.fixture
def persistence(tmp_path):
    catalog = CatalogService(str(tmp_path / "cat.db"))
    return PersistenceService(str(tmp_path / "data"), catalog)


def test_browser_crawl_same_host_bfs(persistence):
    pages = {
        "https://docs.x/": ("<html>root</html>",
                            ["https://docs.x/a", "https://docs.x/b",
                             "https://other.host/evil",
                             "https://docs.x/logo.png"]),
        "https://docs.x/a": ("<html>page a</html>", ["https://docs.x/"]),
        "https://docs.x/b": ("<html>page b</html>", []),
    }
    driver = FakeDriver(pages)
    scraper = BrowserSSOScraper(persistence, driver_factory=lambda: driver,
                                max_depth=2, wait_time=0)
    hashes = scraper.crawl("https://docs.x/")
    assert len(hashes) == 3  # root + a + b; off-host and images excluded
    assert "https://other.host/evil" not in driver.visited
    assert driver.quit_called
    docs = persistence.catalog.list_documents()
    assert all(d["source_type"] == "sso" for d in docs)
    urls = {d["url"] for d in docs}
    assert urls == {"https://docs.x/", "https://docs.x/a",
                    "https://docs.x/b"}


def test_form_login_fills_and_submits(persistence):
    pages = {"https://site.x/": ("<html>home</html>", [])}
    driver = FakeDriver(pages)
    login = form_login("alice", "pw123", wait=0)
    scraper = BrowserSSOScraper(
        persistence, driver_factory=lambda: driver, login=login,
        wait_time=0)
    scraper.crawl("https://site.x/")
    assert driver.login_elements["input[name=username]"].typed == ["alice"]
    assert driver.login_elements["input[name=password]"].typed == ["pw123"]
    assert driver.login_elements["button[type=submit]"].clicked


def test_max_pages_bounds_crawl(persistence):
    # every page links to two new ones — crawl must stop at max_pages
    pages = {}
    def link(i):
        return f"https://big.x/p{i}"
    for i in range(50):
        pages[link(i)] = (f"<html>{i}</html>", [link(2 * i + 1),
                                                link(2 * i + 2)])
    driver = FakeDriver(pages)
    scraper = BrowserSSOScraper(persistence, driver_factory=lambda: driver,
                                max_depth=10, max_pages=7, wait_time=0)
    hashes = scraper.crawl(link(0))
    assert len(hashes) == 7


def test_selenium_gate():
    assert selenium_available() is False  # not in this image
    with pytest.raises(ImportError):
        BrowserSSOScraper(None)  # no factory and no selenium
