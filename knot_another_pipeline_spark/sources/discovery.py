"""Archive discovery + bronze layer: the out-of-engine half of ingestion.

Reference: the NOAA index client and bronze S3 layout in
``/root/reference/pipelines/ais_pipeline.py`` — HTML index scraping
(S1, :230-266), per-date URL probing (S2, :277-307), streaming download
with reuse (S3, :341-370), raw byte-identical bronze puts under a
Hive-style date prefix (S4, :90-94, 373-380) and the idempotence probe
(S5, :126-134).

These are deliberately *driver-side*: discovery and raw-archive
preservation happen before any Spark job exists (the reference pushes
them out of Athena for the same reason). The engine boundary starts at
:mod:`knot_another_pipeline_spark.sources.ingest`, which reads whatever
this module lands. Everything here is filesystem/URL-agnostic (local
paths in tests, ``s3a://`` or ``https://`` in production) and uses only
the standard library.
"""

from __future__ import annotations

import re
import shutil
import urllib.request
from dataclasses import dataclass
from datetime import date, timedelta
from pathlib import Path

#: Archive-name pattern: the reference matches daily archives named
#: ``AIS_YYYY_MM_DD.zip`` / ``...csv.zst`` in the yearly index page.
_ARCHIVE_RE = re.compile(
    r"""href=["']?(?P<href>[^"'\s>]*?
        (?P<name>[A-Za-z]+_(?P<y>\d{4})_(?P<m>\d{2})_(?P<d>\d{2})
        \.(?:zip|csv\.zst)))["'\s>]""",
    re.VERBOSE,
)


@dataclass(frozen=True)
class ArchiveRef:
    """A discovered daily archive (reference ``FileDescriptor``,
    ``ais_pipeline.py:73-94``)."""

    url: str
    filename: str
    day: date

    @property
    def bronze_key(self) -> str:
        """Hive-style bronze prefix (``ais_pipeline.py:90-94``):
        partition values live in the path, the blob stays byte-identical."""
        return (
            f"bronze/ais/year={self.day.year:04d}/month={self.day.month:02d}/"
            f"day={self.day.day:02d}/{self.filename}"
        )


def scrape_index(html: str, *, base_url: str = "") -> list[ArchiveRef]:
    """Parse an index page's archive links (S1). Filename → date via the
    embedded ``YYYY_MM_DD``; non-archive links are ignored. Sorted by day
    (the reference sorts its file list, ``ais_pipeline.py:223``)."""
    out = []
    for m in _ARCHIVE_RE.finditer(html):
        d = date(int(m["y"]), int(m["m"]), int(m["d"]))
        href = m["href"]
        url = href if "://" in href else base_url.rstrip("/") + "/" + href.lstrip("/")
        out.append(ArchiveRef(url=url, filename=m["name"], day=d))
    return sorted(out, key=lambda a: (a.day, a.filename))


def probe_dates(
    url_template: str,
    start: date,
    stop: date,
    *,
    exists=None,
) -> list[ArchiveRef]:
    """Templated per-date probe (S2): expand ``{y}/{m}/{d}`` over the
    inclusive date range and keep URLs that exist. ``exists`` is the
    probe predicate (HEAD request in production; injected in tests —
    default tries ``urllib`` and treats any error as absent)."""
    if exists is None:

        def exists(url: str) -> bool:  # pragma: no cover - network path
            try:
                req = urllib.request.Request(url, method="HEAD")
                with urllib.request.urlopen(req, timeout=10) as resp:
                    return 200 <= resp.status < 300
            except Exception:
                return False

    out = []
    day = start
    while day <= stop:
        url = url_template.format(y=f"{day.year:04d}", m=f"{day.month:02d}", d=f"{day.day:02d}")
        if exists(url):
            out.append(
                ArchiveRef(url=url, filename=url.rsplit("/", 1)[-1], day=day)
            )
        day += timedelta(days=1)
    return out


def download(ref: ArchiveRef, dest_dir: str | Path) -> Path:
    """Fetch an archive to ``dest_dir`` (S3), reusing an existing complete
    file (the reference skips re-downloads, ``ais_pipeline.py:347-352``).
    ``file://`` and local paths work offline; http(s) in production."""
    dest = Path(dest_dir) / ref.filename
    if dest.exists() and dest.stat().st_size > 0:
        return dest
    dest.parent.mkdir(parents=True, exist_ok=True)
    src = ref.url
    if "://" not in src:
        shutil.copyfile(src, dest)
        return dest
    with urllib.request.urlopen(src) as resp, open(dest, "wb") as fh:
        shutil.copyfileobj(resp, fh)
    return dest


def bronze_exists(bronze_root: str | Path, ref: ArchiveRef) -> bool:
    """Idempotence probe (S5, reference ``bronze_exists``): skip work when
    the bronze object is already present."""
    return (Path(bronze_root) / ref.bronze_key).exists()


def upload_bronze(
    local_file: str | Path, bronze_root: str | Path, ref: ArchiveRef
) -> Path:
    """Raw bronze put (S4): byte-identical copy under the Hive-style date
    prefix; never decompresses or rewrites — bronze is the lineage zone."""
    target = Path(bronze_root) / ref.bronze_key
    target.parent.mkdir(parents=True, exist_ok=True)
    if not target.exists():
        shutil.copyfile(local_file, target)
    return target
