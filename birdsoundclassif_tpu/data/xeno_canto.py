"""Xeno-Canto recording downloader CLI.

Re-implements the reference's separate pip package `xeno_canto_utils_nbm`
(reference: xc_utils/src/xeno_canto_utils_nbm/xeno_canto_utils.py:14-186):
query the XC API v2 with species/type/quality/length filters, confirm,
download mp3s, convert to mono 44.1 kHz wav, and track downloaded ids in
file_ids.json to avoid duplicates.

Console usage:
  python -m birdsoundclassif_tpu.data.xeno_canto -s "Turdus merula" \
      -t call -q A -lt 60 -o out_dir [--yes]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import urllib.parse
import urllib.request
from typing import Dict, List, Optional

XC_API = "https://xeno-canto.org/api/2/recordings"


def query_recordings(
    species: str,
    sound_type: Optional[str] = None,
    quality: Optional[str] = None,
    max_length: Optional[float] = None,
    area: Optional[str] = None,
) -> List[Dict]:
    """All API pages for a query; returns recording dicts."""
    parts = [species]
    if sound_type:
        parts.append(f"type:{sound_type}")
    if quality:
        parts.append(f"q:{quality}")
    if max_length:
        parts.append(f'len:"<{max_length}"')
    if area:
        parts.append(f"area:{area}")
    query = urllib.parse.quote(" ".join(parts))
    recordings: List[Dict] = []
    page = 1
    while True:
        with urllib.request.urlopen(f"{XC_API}?query={query}&page={page}") as r:
            data = json.loads(r.read().decode())
        recordings.extend(data.get("recordings", []))
        if page >= int(data.get("numPages", 1)):
            break
        page += 1
    return recordings


def _load_seen(out_dir: str) -> Dict[str, List[str]]:
    path = os.path.join(out_dir, "file_ids.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _save_seen(out_dir: str, seen: Dict[str, List[str]]) -> None:
    with open(os.path.join(out_dir, "file_ids.json"), "w") as f:
        json.dump(seen, f)


def convert_mp3_to_wav(mp3_path: str, sample_rate: int = 44_100,
                       keep_mp3: bool = False) -> Optional[str]:
    """mono wav via ffmpeg (reference: :89-128), or the in-process
    libmpg123 decoder (audio/mp3.py) when the binary is absent."""
    wav_path = os.path.splitext(mp3_path)[0] + ".wav"
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is not None:
        subprocess.run(
            [ffmpeg, "-y", "-i", mp3_path, "-ac", "1", "-ar", str(sample_rate),
             wav_path],
            check=True, capture_output=True,
        )
    else:
        from ..audio.mp3 import convert_mp3_to_wav_native, mpg123_available

        if not mpg123_available():
            print("no mp3 decoder available (ffmpeg/libmpg123); keeping mp3")
            return None
        if convert_mp3_to_wav_native(mp3_path, wav_path, sample_rate) is None:
            return None
    if not keep_mp3:
        os.remove(mp3_path)
    return wav_path


def download_request(
    species: str,
    sound_type: Optional[str],
    quality: Optional[str],
    max_length: Optional[float],
    out_dir: str,
    assume_yes: bool = False,
    area: Optional[str] = None,
) -> int:
    recs = query_recordings(species, sound_type, quality, max_length, area)
    print(f"{len(recs)} recordings match the query")
    if not recs:
        return 0
    if not assume_yes:
        ans = input("Download? [y/N] ").strip().lower()
        if ans != "y":
            return 0
    os.makedirs(out_dir, exist_ok=True)
    seen = _load_seen(out_dir)
    species_key = species.replace(" ", "_").lower()
    seen_ids = set(seen.get(species_key, []))
    n = 0
    for rec in recs:
        rec_id = str(rec.get("id"))
        if rec_id in seen_ids:
            continue
        url = rec.get("file")
        if not url:
            continue
        if url.startswith("//"):
            url = "https:" + url
        dest = os.path.join(out_dir, f"{species_key}#XC{rec_id}.mp3")
        try:
            urllib.request.urlretrieve(url, dest)
        except Exception as e:
            print(f"download failed for XC{rec_id}: {e}")
            continue
        convert_mp3_to_wav(dest)
        seen_ids.add(rec_id)
        n += 1
    seen[species_key] = sorted(seen_ids)
    _save_seen(out_dir, seen)
    print(f"downloaded {n} new recordings")
    return n


def download_from_annots(annot_dir: str, out_dir: str) -> int:
    """Fetch the XC recordings named by annotation files
    `<species>#XC<id>.txt` (reference: download_species_ids, :146-174)."""
    ids = []
    for f in os.listdir(annot_dir):
        base = os.path.splitext(f)[0]
        if "#XC" in base:
            sp, xc = base.split("#XC")
            ids.append((sp.replace("_", " ").capitalize(), xc))
    n = 0
    for sp, xc in ids:
        recs = query_recordings(f"nr:{xc}")
        for rec in recs:
            url = rec.get("file")
            if not url:
                continue
            if url.startswith("//"):
                url = "https:" + url
            dest = os.path.join(out_dir, f"{sp.replace(' ', '_').lower()}#XC{xc}.mp3")
            urllib.request.urlretrieve(url, dest)
            convert_mp3_to_wav(dest)
            n += 1
    return n


def main(argv=None) -> int:
    p = argparse.ArgumentParser("xeno — Xeno-Canto downloader")
    p.add_argument("-s", "--species", required=True)
    p.add_argument("-t", "--type", dest="sound_type", default=None)
    p.add_argument("-q", "--quality", default=None)
    p.add_argument("-lt", "--max_length", type=float, default=None)
    p.add_argument("-a", "--area", default=None)
    p.add_argument("-o", "--out_dir", required=True)
    p.add_argument("--yes", action="store_true", help="skip the confirm prompt")
    a = p.parse_args(argv)
    download_request(a.species, a.sound_type, a.quality, a.max_length,
                     a.out_dir, assume_yes=a.yes, area=a.area)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
