"""Deterministic Sparkify-shaped raw-data generator (FIXTURES.md §A).

Writes the two raw JSON datasets in the reference's exact layout:
``song_data/<A>/<B>/<C>/<track>.json`` (one object per file,
README.md:22-27) and ``log_data/<yyyy>/<mm>/<date>-events.json``
(NDJSON, README.md:37-42). The data is seeded so it exercises every
edge the reference's semantics depend on:

* duplicate (title, artist-variant) pairs → golden-Q1's expected dupes;
* users who switch level mid-data → the (user_id, level) quirk Q7;
* empty-string and null ``userId``/``song_id`` rows → filter+dropna;
* plays of songs NOT in the song dataset → left-join null fill (Q6);
* events spanning two months → (year, month) partitioning is real;
* non-NextSong pages → the page predicate filters something.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

SONGS = [
    # (song_id, title, artist_id, artist_name, year, duration)
    ("SOAAAAAA1", "Midnight Harbor", "ARAAAA1", "The Lanterns", 2004, 215.3),
    ("SOBBBBBB2", "Midnight Harbor", "ARAAAA2", "The Lanterns feat. Mo", 2006, 218.1),
    ("SOCCCCCC3", "Glass River", "ARBBBB1", "Ada Vane", 2010, 187.9),
    ("SODDDDDD4", "Paper Planes North", "ARCCCC1", "Kestrel Union", 0, 240.0),
    ("SOEEEEEE5", "Salt & Static", "ARBBBB1", "Ada Vane", 2012, 199.4),
    ("SOFFFFFF6", "Low Tide Waltz", "ARDDDD1", "Brine Quartet", 1998, 312.7),
    ("SOGGGGGG7", "Copper Sky", "AREEEE1", "Vel Moraine", 2015, 176.2),
    ("SOHHHHHH8", "Copper Sky", "AREEEE2", "Vel Moraine & Co", 2016, 175.0),
]

USERS = [
    # (userId, first, last, gender, [levels in order])
    ("11", "Nora", "Fleet", "F", ["free", "paid"]),  # level switcher
    ("12", "Omar", "Quill", "M", ["paid"]),
    ("13", "Pia", "Sorrel", "F", ["free"]),
    ("14", "Quinn", "Tarn", "M", ["free", "paid"]),  # level switcher
    ("15", "Rosa", "Umber", "F", ["paid"]),
    ("16", "Sam", "Vex", "M", ["free"]),
]

# titles played that do NOT exist in song_data → null-filled fact rows
UNKNOWN_PLAYS = [("Static Bloom", "No Such Band"), ("Era of Wires", "Ghost Choir")]

NOV1_MS = 1541030400000  # 2018-11-01 00:00:00 UTC
DAY_MS = 86400000


def write_song_data(root: Path) -> None:
    for song_id, title, artist_id, name, year, dur in SONGS:
        p = root / "song_data" / song_id[2] / song_id[3] / song_id[4]
        p.mkdir(parents=True, exist_ok=True)
        rec = {
            "num_songs": 1,
            "artist_id": artist_id,
            "artist_latitude": 40.5 if name < "M" else None,
            "artist_longitude": -73.9 if name < "M" else None,
            "artist_location": "Harbor City" if year else "",
            "artist_name": name,
            "song_id": song_id,
            "title": title,
            "duration": dur,
            "year": year,
        }
        (p / f"TR{song_id}.json").write_text(json.dumps(rec))
    # one corrupt-ish record with empty ids: must be dropped by builders
    p = root / "song_data" / "X" / "X" / "X"
    p.mkdir(parents=True, exist_ok=True)
    (p / "TRXXXX.json").write_text(
        json.dumps(
            {
                "num_songs": 1,
                "artist_id": "",
                "artist_name": "Nameless",
                "song_id": "",
                "title": "Void Track",
                "duration": 1.0,
                "year": 0,
            }
        )
    )


def _event(ts_ms: int, user, level: str, song, session_id: int, page: str) -> dict:
    uid, first, last, gender, _ = user
    title, artist = song
    return {
        "artist": artist,
        "auth": "Logged In",
        "firstName": first,
        "gender": gender,
        "itemInSession": 0,
        "lastName": last,
        "length": 200.0,
        "level": level,
        "location": "Harbor City, HC",
        "method": "PUT" if page == "NextSong" else "GET",
        "page": page,
        "registration": float(NOV1_MS),
        "sessionId": session_id,
        "song": title,
        "status": 200,
        "ts": ts_ms,
        "userAgent": "Mozilla/5.0 (test)",
        "userId": uid,
    }


def write_log_data(root: Path, n_days: int = 45) -> None:
    """~45 days of events (spans Nov→Dec 2018, two (year,month) output
    partitions)."""
    rng = random.Random(42)
    playable = [(t, a) for _, t, _, a, _, _ in SONGS] + UNKNOWN_PLAYS
    session_counter = 100
    for day in range(n_days):
        day_start = NOV1_MS + day * DAY_MS
        events: list[dict] = []
        for user in USERS:
            uid, _, _, _, levels = user
            # switchers change level halfway through the date range
            level = levels[0] if day < n_days // 2 else levels[-1]
            session_counter += 1
            n_plays = rng.randint(0, 3 + int(uid) % 4)
            t = day_start + rng.randint(0, 6) * 3600_000
            for _ in range(n_plays):
                song = rng.choice(playable)
                events.append(_event(t, user, level, song, session_counter, "NextSong"))
                t += rng.randint(60, 400) * 1000
            events.append(_event(t + 1000, user, level, playable[0], session_counter, "Home"))
        # anonymous traffic: empty userId, must be dropped
        events.append(
            _event(day_start + 3600_000, ("", "", "", "F", ["free"]), "free",
                   playable[0], 9999, "NextSong")
        )
        d = root / "log_data" / "2018"
        d.mkdir(parents=True, exist_ok=True)
        lines = "\n".join(json.dumps(e) for e in events)
        from datetime import datetime, timezone

        date = datetime.fromtimestamp(day_start / 1000, tz=timezone.utc)
        (d / f"{date:%Y-%m-%d}-events.json").write_text(lines)


def write_sparkify_fixture(root: Path) -> tuple[str, str]:
    """Returns (song_data_path, log_data_path)."""
    write_song_data(root)
    write_log_data(root)
    return str(root / "song_data"), str(root / "log_data")
