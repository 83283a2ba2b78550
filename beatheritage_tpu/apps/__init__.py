"""User-facing apps: CLI inference, MaiMod, web UI."""
