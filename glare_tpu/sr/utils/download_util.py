"""URL/Google-Drive download helpers (reference: basicsr/utils/download_util.py).

Implemented on stdlib urllib (requests/torch.hub are gratuitous deps for
this): ``load_file_from_url`` caches into ``model_dir`` (default
``~/.cache/glare_tpu/checkpoints``) and ``download_file_from_google_drive``
handles the drive confirm-token dance. This environment has no egress —
the functions are exercised only when a network exists; the cache-hit
path (already-downloaded file) is testable offline.
"""

from __future__ import annotations

import math
import os
import shutil
import urllib.request
from http.cookiejar import CookieJar
from urllib.parse import urlencode, urlparse

from .misc import sizeof_fmt


def _default_model_dir():
    return os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "glare_tpu",
        "checkpoints",
    )


def save_response_content(response, destination, file_size=None, chunk_size=32768):
    """Stream an open url response to ``destination`` with a progress line
    (reference: download_util.py:49-67)."""
    readable = sizeof_fmt(file_size) if file_size is not None else "?"
    total_chunks = math.ceil(file_size / chunk_size) if file_size else None
    downloaded = 0
    with open(destination, "wb") as f:
        while True:
            chunk = response.read(chunk_size)
            if not chunk:
                break
            downloaded += len(chunk)
            f.write(chunk)
            if total_chunks is not None:
                print(f"\rDownload {sizeof_fmt(downloaded)} / {readable}", end="")
    if total_chunks is not None:
        print()


def get_confirm_token(cookiejar):
    """Google-Drive large-file confirm token from the warning cookie
    (reference: download_util.py:42-46)."""
    for cookie in cookiejar:
        if cookie.name.startswith("download_warning"):
            return cookie.value
    return None


def download_file_from_google_drive(file_id, save_path):
    """Reference: download_util.py:11-39."""
    base = "https://docs.google.com/uc?export=download"
    jar = CookieJar()
    opener = urllib.request.build_opener(urllib.request.HTTPCookieProcessor(jar))

    url = f"{base}&{urlencode({'id': file_id})}"
    response = opener.open(url)
    token = get_confirm_token(jar)
    if token:
        url = f"{base}&{urlencode({'id': file_id, 'confirm': token})}"
        response = opener.open(url)

    file_size = None
    probe = urllib.request.Request(url, headers={"Range": "bytes=0-2"})
    try:
        with opener.open(probe) as r:
            content_range = r.headers.get("Content-Range")
            if content_range:
                file_size = int(content_range.split("/")[1])
    except Exception:
        pass

    save_response_content(response, save_path, file_size)


def load_file_from_url(url, model_dir=None, progress=True, file_name=None):
    """Download ``url`` into ``model_dir`` unless already cached; return the
    local path (reference: download_util.py:70-98)."""
    if model_dir is None:
        model_dir = _default_model_dir()
    os.makedirs(model_dir, exist_ok=True)

    filename = file_name or os.path.basename(urlparse(url).path)
    cached_file = os.path.abspath(os.path.join(model_dir, filename))
    if not os.path.exists(cached_file):
        print(f'Downloading: "{url}" to {cached_file}\n')
        tmp = cached_file + ".part"
        with urllib.request.urlopen(url) as response:
            size = response.headers.get("Content-Length")
            save_response_content(
                response, tmp, int(size) if (size and progress) else None
            )
        shutil.move(tmp, cached_file)
    return cached_file
