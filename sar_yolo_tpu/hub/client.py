"""HTTP client primitives for the model-hub integration.

Capability parity with reference hub/utils.py (smart_request:111, retry/backoff
semantics) and hub/auth.py (Auth:11, header construction, key validation).
Differences by design:

  * endpoints are env-configurable (`SARYOLO_HUB_API` / `SARYOLO_HUB_WEB`) and
    there is NO default public endpoint — this build is offline-first, so hub
    traffic only ever flows to a host the user explicitly configured;
  * no Colab cookie path and no interactive getpass loop — keys come from the
    argument, `SARYOLO_API_KEY`, or persisted settings;
  * no telemetry. The reference ships Google-Analytics event collection
    (hub/utils.py Events:170); this framework does not phone home, so `events`
    is a permanently-disabled stub kept only for API-shape parity.
"""

from __future__ import annotations

import os
import threading
import time

from sar_yolo_tpu.utils import LOGGER
from sar_yolo_tpu.utils.settings import SETTINGS, update_settings

PREFIX = "SAR-YOLO HUB: "
# codes worth retrying: transient server/timeout conditions
RETRY_CODES = (408, 500, 502, 504)


def hub_api_root() -> str:
    """Configured API root (no default: offline build, explicit opt-in)."""
    return os.environ.get("SARYOLO_HUB_API", "").rstrip("/")


def hub_web_root() -> str:
    return os.environ.get("SARYOLO_HUB_WEB", hub_api_root()).rstrip("/")


def smart_request(method: str, url: str, retry: int = 3, timeout: float = 30.0,
                  thread: bool = False, verbose: bool = True, **kwargs):
    """HTTP request with exponential-backoff retries bounded by a wall timeout.

    Returns the `requests.Response` (or None if every attempt errored); when
    `thread=True` the request runs on a daemon thread and None is returned
    immediately. Retries only on RETRY_CODES; 4xx client errors return at once.
    """
    import requests

    def attempt():
        t0 = time.time()
        resp = None
        for i in range(retry + 1):
            if time.time() - t0 > timeout:
                if verbose:
                    LOGGER.warning(f"{PREFIX}request timeout budget exhausted ({url})")
                break
            try:
                resp = requests.request(method, url, timeout=timeout, **kwargs)
            except requests.RequestException as e:
                if verbose:
                    LOGGER.warning(f"{PREFIX}request error ({e.__class__.__name__}), "
                                   f"attempt {i + 1}/{retry + 1}")
                resp = None
                if i < retry:  # no dead backoff after the final attempt
                    time.sleep(min(2 ** i, 30))
                continue
            if resp.status_code < 300:
                return resp
            if resp.status_code == 429:  # rate-limited: honor Retry-After
                wait = float(resp.headers.get("Retry-After", 2 ** i))
                if verbose:
                    LOGGER.warning(f"{PREFIX}rate limited, retrying in {wait:.0f}s")
                if i < retry:
                    time.sleep(min(wait, 30))
                continue
            if resp.status_code not in RETRY_CODES:
                if verbose:
                    LOGGER.warning(f"{PREFIX}request failed "
                                   f"({resp.status_code} {method} {url})")
                return resp
            if verbose and i == 0:
                LOGGER.warning(f"{PREFIX}transient {resp.status_code}, "
                               f"retrying up to {retry}x")
            if i < retry:
                time.sleep(min(2 ** i, 30))
        return resp

    if thread:
        threading.Thread(target=attempt, daemon=True).start()
        return None
    return attempt()


class Auth:
    """API-key auth: resolve a key, validate it against the hub, build headers.

    Key resolution order: explicit argument > SARYOLO_API_KEY env > persisted
    settings["api_key"]. A combined "key_modelid" string keeps only the key
    part (same convention as the reference's combined keys).
    """

    def __init__(self, api_key: str = "", verbose: bool = False):
        api_key = (api_key or os.environ.get("SARYOLO_API_KEY", "")
                   or SETTINGS.get("api_key", ""))
        self.api_key = api_key.split("_")[0] if api_key else ""
        self.authenticated = False
        if not self.api_key:
            if verbose:
                LOGGER.info(f"{PREFIX}no API key configured "
                            "(set SARYOLO_API_KEY or `saryolo login KEY`)")
            return
        if not hub_api_root():
            if verbose:
                LOGGER.info(f"{PREFIX}no hub endpoint configured "
                            "(set SARYOLO_HUB_API); key kept locally")
            return
        self.authenticated = self.authenticate()
        if verbose:
            LOGGER.info(f"{PREFIX}authenticated" if self.authenticated
                        else f"{PREFIX}invalid API key")

    def authenticate(self) -> bool:
        r = smart_request("post", f"{hub_api_root()}/v1/auth",
                          headers=self.header(), retry=1, timeout=10,
                          verbose=False)
        try:  # a 2xx with a non-JSON body (proxy, captive portal) is not auth
            body = r.json() if r is not None else {}
        except ValueError:
            body = {}
        ok = bool(r is not None and r.status_code < 300
                  and body.get("success", True))
        if not ok:
            self.api_key = ""
        return ok

    def header(self) -> dict:
        return {"x-api-key": self.api_key} if self.api_key else {}

    def save(self):
        update_settings(api_key=self.api_key)


class _DisabledEvents:
    """API-shape stand-in for the reference's analytics (hub/utils.py:170).

    Always disabled: this framework collects no usage telemetry.
    """

    enabled = False

    def __call__(self, cfg=None):
        return None


events = _DisabledEvents()
