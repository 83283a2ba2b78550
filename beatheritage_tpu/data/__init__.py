"""Data layer: beatmap -> events parsing, event utilities, audio, datasets."""

from .event_utils import (
    Group,
    events_of_type,
    get_groups,
    get_hitsounded_status,
    get_hold_note_ratio,
    get_median_mpb,
    get_median_mpb_beatmap,
    get_scroll_speed_ratio,
    get_song_length,
    merge_events,
    remove_events_of_type,
    speed_events,
    update_event_times,
)
from .parser import BeatmapParser

__all__ = [
    "Group", "events_of_type", "get_groups", "get_hitsounded_status",
    "get_hold_note_ratio", "get_median_mpb", "get_median_mpb_beatmap",
    "get_scroll_speed_ratio", "get_song_length", "merge_events",
    "remove_events_of_type", "speed_events", "update_event_times",
    "BeatmapParser",
]
