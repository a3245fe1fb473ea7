"""Physical layout & plan inspection (the DISTKEY/SORTKEY layer)."""
