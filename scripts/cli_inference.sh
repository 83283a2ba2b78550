#!/usr/bin/env bash
# Interactive prompt builder for CLI inference (reference: cli_inference.sh).
# Walks through the common options and emits/executes the python command.
set -euo pipefail

echo "=== BeatHeritage TPU: interactive inference ==="

read -rp "Config name [beatheritage_v1]: " CONFIG
CONFIG=${CONFIG:-beatheritage_v1}

read -rp "Audio path (required): " AUDIO
while [[ -z "$AUDIO" || ! -f "$AUDIO" ]]; do
  read -rp "File not found. Audio path: " AUDIO
done

read -rp "Output directory [./output]: " OUTPUT
OUTPUT=${OUTPUT:-./output}

read -rp "Reference beatmap (.osu, optional): " BEATMAP

echo "Gamemode: 0=osu! 1=taiko 2=catch 3=mania"
read -rp "Gamemode [0]: " GAMEMODE
GAMEMODE=${GAMEMODE:-0}

read -rp "Difficulty stars (optional, e.g. 5.5): " DIFFICULTY
read -rp "Mapper ID (optional): " MAPPER
read -rp "Year (optional): " YEAR

if [[ "$GAMEMODE" == "3" ]]; then
  read -rp "Key count [4]: " KEYCOUNT
  KEYCOUNT=${KEYCOUNT:-4}
fi

echo "Descriptors (space separated, empty to finish). Examples:"
echo "  jump-aim stream tech simple clean symmetrical"
read -rp "Descriptors: " DESCRIPTORS

read -rp "CFG scale [1.0]: " CFG
CFG=${CFG:-1.0}
read -rp "Use super timing generator? [y/N]: " SUPER
read -rp "Export .osz? [y/N]: " OSZ

CMD=(python -m beatheritage_tpu.apps.cli -cn "$CONFIG"
     "audio_path=$AUDIO" "output_path=$OUTPUT" "gamemode=$GAMEMODE"
     "cfg_scale=$CFG")
[[ -n "$BEATMAP" ]] && CMD+=("beatmap_path=$BEATMAP")
[[ -n "$DIFFICULTY" ]] && CMD+=("difficulty=$DIFFICULTY")
[[ -n "$MAPPER" ]] && CMD+=("mapper_id=$MAPPER")
[[ -n "$YEAR" ]] && CMD+=("year=$YEAR")
[[ -n "${KEYCOUNT:-}" ]] && CMD+=("keycount=$KEYCOUNT")
if [[ -n "$DESCRIPTORS" ]]; then
  DESC_LIST=$(echo "$DESCRIPTORS" | sed 's/ /,/g')
  CMD+=("descriptors=[$DESC_LIST]")
fi
[[ "${SUPER,,}" == "y" ]] && CMD+=("super_timing=true")
[[ "${OSZ,,}" == "y" ]] && CMD+=("export_osz=true")

echo
echo "Command: ${CMD[*]}"
read -rp "Run now? [Y/n]: " RUN
if [[ "${RUN,,}" != "n" ]]; then
  "${CMD[@]}"
fi
