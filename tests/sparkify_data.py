"""Deterministic Sparkify-shaped JSON fixtures (FIXTURES.md group A).

Engineered to make every quirk observable:
- ~30% of NextSong events match a catalog song on (artist, title,
  DECIMAL(9,0) duration) — including pairs whose *raw float* lengths differ
  but round equal (K4 must merge them) and pairs separated only by rounding.
- several users appear with both level values (K3 duplicate rows).
- ts values carry non-zero millisecond remainders (K5 truncation).
- duplicate song_id rows in the catalog (DISTINCT observable).
- null userId / artist rows (null-handling in casts and joins).
"""

from __future__ import annotations

import json
import os
import random

FIRST = ["Ava", "Ben", "Cleo", "Dan", "Eve", "Finn", "Gia", "Hal", "Ivy", "Jo"]
LAST = ["Stone", "Reed", "Lake", "Frost", "Hale", "Park", "Wells", "Moss", "Rhodes", "Cruz"]
PAGES = ["NextSong", "Home", "Login", "Logout", "Help"]
CITIES = ["Portland, OR", "Austin, TX", "Boise, ID", "Reno, NV", "Omaha, NE"]


def generate(out_dir: str, n_songs: int = 120, n_events: int = 2500, seed: int = 42):
    rng = random.Random(seed)
    songs = []
    for i in range(n_songs):
        dur = round(rng.uniform(90, 360), 3)
        songs.append(
            {
                "num_songs": 1,
                "artist_id": f"AR{i % 60:016d}",
                "artist_latitude": round(rng.uniform(-60, 60), 3) if rng.random() < 0.6 else None,
                "artist_longitude": round(rng.uniform(-150, 150), 3) if rng.random() < 0.6 else None,
                "artist_location": rng.choice(CITIES) if rng.random() < 0.7 else "",
                "artist_name": f"Artist {i % 60}",
                "song_id": f"SO{i:016d}",
                "title": f"Song Title {i}",
                "duration": dur,
                "year": rng.choice([0] + list(range(1960, 2021))),
            }
        )
    # duplicate catalog rows (same song_id) so DISTINCT is observable
    for i in range(0, n_songs, 17):
        songs.append(dict(songs[i]))

    events = []
    t = 1541200000123  # epoch ms, non-zero sub-second remainder (K5)
    for i in range(n_events):
        t += rng.randint(10_000, 600_000) + rng.randint(1, 999)  # keep ms remainder varied
        uid = rng.randint(1, 25) if rng.random() < 0.95 else None
        # K3: users 1-5 flip level across events
        level = "paid" if (uid or 0) > 5 and rng.random() < 0.5 else rng.choice(["free", "paid"])
        page = rng.choice(PAGES) if rng.random() < 0.35 else "NextSong"
        ev = {
            "artist": None,
            "auth": "Logged In" if uid else "Logged Out",
            "firstName": FIRST[(uid or 0) % 10] if uid else None,
            "gender": rng.choice(["M", "F"]) if uid else None,
            "itemInSession": rng.randint(0, 8),
            "lastName": LAST[(uid or 0) % 10] if uid else None,
            "length": None,
            "level": level,
            "location": rng.choice(CITIES),
            "method": "PUT" if page == "NextSong" else "GET",
            "page": page,
            "registration": str(1540000000000 + (uid or 0) * 7919),
            "sessionId": 1000 + (uid or 0) * 40 + rng.randint(0, 39),
            "song": None,
            "status": rng.choice([200, 200, 200, 307, 404]),
            "ts": t,
            "userAgent": '"Mozilla/5.0 (X11; Linux x86_64)"',
            "userId": str(uid) if uid else "",
        }
        if page == "NextSong":
            if rng.random() < 0.35:
                s = rng.choice(songs)
                ev["artist"] = s["artist_name"]
                ev["song"] = s["title"]
                # raw float differs from catalog duration but DECIMAL(9,0)
                # rounds equal for most (K4 merge); some pushed off by >0.5
                # so rounding separates them.
                jitter = rng.uniform(-0.4, 0.4) if rng.random() < 0.8 else rng.uniform(0.6, 1.4)
                ev["length"] = round(s["duration"] + jitter, 3)
            else:
                ev["artist"] = f"Unknown Artist {rng.randint(0, 200)}"
                ev["song"] = f"Unknown Song {rng.randint(0, 500)}"
                ev["length"] = round(rng.uniform(60, 400), 3)
        events.append(ev)

    os.makedirs(out_dir, exist_ok=True)
    log_path = os.path.join(out_dir, "log_data")
    song_path = os.path.join(out_dir, "song_data")
    os.makedirs(log_path, exist_ok=True)
    os.makedirs(song_path, exist_ok=True)
    # multiple files: COPY parallelizes over objects; so does spark.read
    for part in range(4):
        with open(os.path.join(log_path, f"events-{part}.json"), "w") as f:
            for ev in events[part::4]:
                f.write(json.dumps(ev) + "\n")
    for part in range(4):
        with open(os.path.join(song_path, f"songs-{part}.json"), "w") as f:
            for s in songs[part::4]:
                f.write(json.dumps(s) + "\n")
    return log_path, song_path
