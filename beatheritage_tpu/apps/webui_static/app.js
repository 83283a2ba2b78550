// BeatHeritage TPU web UI logic (reference: static/app.js behaviors —
// per-gamemode/per-model field gating, tri-state descriptor conditioning,
// tqdm progress parsing with a live step table, flash messages, error
// detection + error-log link, log controls, localStorage persistence,
// config export/import, server presets, MaiMod view).

const $ = (id) => document.getElementById(id);
const form = $("f");

// =============================================================================
// Flash messages (reference Utils.showFlashMessage)
// =============================================================================

function flash(message, type = "success") {
  const box = document.createElement("div");
  box.className = "alert " + (type === "success" ? "alert-success"
    : type === "cancel" ? "alert-cancel" : "alert-error");
  box.textContent = message;
  $("flash-container").appendChild(box);
  setTimeout(() => box.classList.add("show"));
  setTimeout(() => {
    box.classList.remove("show");
    setTimeout(() => box.remove(), 400);
  }, 5000);
}

function scrollToEl(el) {
  (typeof el === "string" ? $(el) : el)
    ?.scrollIntoView({ behavior: "smooth", block: "start" });
}

// =============================================================================
// Tabs
// =============================================================================

function showTab(name) {
  $("page-generate").hidden = name !== "generate";
  $("page-maimod").hidden = name !== "maimod";
  $("tab-generate").classList.toggle("active", name === "generate");
  $("tab-maimod").classList.toggle("active", name === "maimod");
}
$("tab-generate").onclick = () => showTab("generate");
$("tab-maimod").onclick = () => showTab("maimod");

// =============================================================================
// Model list, descriptors (tri-state), context options, capabilities
// =============================================================================

let descriptors = [];
// name -> "pos" | "neg"  (absent = off); click cycles off -> pos -> neg -> off
const descriptorState = new Map();

async function loadModels() {
  const names = await (await fetch("/models")).json();
  for (const sel of [$("model"), $("maimod-model")]) {
    sel.innerHTML = names
      .map((n) => `<option value="${n}">${n}</option>`)
      .join("");
  }
  const saved = localStorage.getItem("bh_model");
  if (saved && names.includes(saved)) $("model").value = saved;
  await loadModelDependent();
}

async function loadModelDependent() {
  const cfg = $("model").value;
  localStorage.setItem("bh_model", cfg);
  descriptors = await (
    await fetch("/descriptors?config=" + encodeURIComponent(cfg))
  ).json();
  for (const name of [...descriptorState.keys()])
    if (!descriptors.includes(name)) descriptorState.delete(name);
  renderDescriptors();
  await loadContextOptions();
  await loadCapabilities();
}

function cycleDescriptor(name) {
  const cur = descriptorState.get(name);
  if (cur === undefined) descriptorState.set(name, "pos");
  else if (cur === "pos") descriptorState.set(name, "neg");
  else descriptorState.delete(name);
}

function renderDescriptors() {
  const q = $("descsearch").value.toLowerCase();
  const box = $("descsel");
  box.innerHTML = "";
  for (const d of descriptors) {
    if (q && !d.toLowerCase().includes(q) && !descriptorState.has(d)) continue;
    const state = descriptorState.get(d);
    const chip = document.createElement("span");
    chip.className = "chip" + (state === "pos" ? " pos"
      : state === "neg" ? " neg" : "");
    chip.textContent = d;
    chip.title = state === "pos" ? "conditioning towards (click for away)"
      : state === "neg" ? "conditioning away (click to clear)"
      : "click to condition towards";
    chip.onclick = () => {
      cycleDescriptor(d);
      renderDescriptors();
      persistState();
    };
    box.appendChild(chip);
  }
  $("descriptor-box").style.display = descriptors.length ? "" : "none";
}
$("descsearch").oninput = renderDescriptors;
$("model").onchange = loadModelDependent;

async function loadContextOptions() {
  const cfg = $("model").value;
  const opts = await (
    await fetch("/context_options?config=" + encodeURIComponent(cfg))
  ).json();
  const box = $("in-context-checks");
  box.innerHTML = "";
  for (const ctx of opts) {
    const lbl = document.createElement("label");
    lbl.className = "check";
    lbl.innerHTML = `<input type="checkbox" name="in_context_options" value="${ctx}"> ${ctx}`;
    box.appendChild(lbl);
  }
  updateVisibility();
}

// Per-model capabilities (reference app.js modelCapabilities, but
// introspected from the model's train config via /capabilities).
let CAPS = {};
async function loadCapabilities() {
  const cfg = $("model").value;
  try {
    CAPS = await (
      await fetch("/capabilities?config=" + encodeURIComponent(cfg))
    ).json();
  } catch (e) {
    CAPS = {};
  }
  const gmSel = $("gamemode");
  if (gmSel && CAPS.supported_gamemodes) {
    for (const opt of gmSel.options) {
      if (opt.value === "") continue;
      const ok = CAPS.supported_gamemodes.includes(+opt.value);
      opt.hidden = !ok;
      opt.disabled = !ok;
      if (!ok && gmSel.value === opt.value) gmSel.value = "";
    }
    // exactly one trained gamemode: pin the selector to it
    if (CAPS.supported_gamemodes.length === 1) {
      gmSel.value = String(CAPS.supported_gamemodes[0]);
    }
  }
  const capGroups = {
    "group-year": CAPS.supports_year,
    "group-hitsounded": CAPS.supports_hitsounds,
  };
  for (const [id, ok] of Object.entries(capGroups)) {
    const el = $(id);
    if (el) el.style.display = ok === false ? "none" : "";
  }
  if (CAPS.supports_hitsounds === false) {
    // models without the hitsounded token always behave as hitsounded
    const cb = form.elements.hitsounded;
    if (cb) cb.checked = true;
  }
  if (CAPS.supports_descriptors === false) {
    descriptorState.clear();
    descriptors = [];
    renderDescriptors();
  }
  updateVisibility();
}

// =============================================================================
// Conditional visibility (reference UIManager.updateConditionalFields)
// =============================================================================

const GROUPS = {
  "group-circle_size": [0, 2],
  "group-approach_rate": [0, 2],
  "group-slider_multiplier": [0, 1, 2],
  "group-slider_tick_rate": [0, 1, 2],
  "group-keycount": [3],
  "group-hold_note_ratio": [3],
  "group-scroll_speed_ratio": [1, 3],
};

function updateVisibility() {
  const gm = $("gamemode").value;
  for (const [id, modes] of Object.entries(GROUPS)) {
    const el = $(id);
    if (el) el.style.display = gm === "" || modes.includes(+gm) ? "" : "none";
  }
  // beatmap-path-dependent sections: in-context options and add-to-beatmap
  // only make sense with a reference beatmap (reference app.js:111-123)
  const hasBeatmap = $("beatmap_path").value.trim() !== "";
  $("in-context-options-box").style.display = hasBeatmap ? "" : "none";
  $("add-to-beatmap-option").style.display = hasBeatmap ? "" : "none";
  if (!hasBeatmap) {
    const cb = form.elements.add_to_beatmap;
    if (cb) cb.checked = false;
  }
}
$("gamemode").onchange = updateVisibility;
$("beatmap_path").addEventListener("input", updateVisibility);

// =============================================================================
// Paths: clear buttons, validation, autofill placeholders
// (reference PathManager)
// =============================================================================

function updateClearButtons() {
  for (const btn of document.querySelectorAll(".clear-input-btn")) {
    const input = $(btn.dataset.target);
    btn.style.display = input && input.value.trim() ? "" : "none";
  }
}
for (const btn of document.querySelectorAll(".clear-input-btn")) {
  btn.onclick = () => {
    const input = $(btn.dataset.target);
    input.value = "";
    input.placeholder = input.id === "audio_path" ? "/path/to/song.mp3"
      : input.id === "output_path" ? "/path/to/output" : "/path/to/map.osu";
    input.classList.remove("valid", "invalid");
    updateClearButtons();
    updateVisibility();
    autofillPlaceholders();
    persistState();
  };
}
document.addEventListener("input", (e) => {
  if (e.target.matches(".input-with-clear input")) updateClearButtons();
});

for (const el of document.querySelectorAll("input[data-validate]")) {
  el.addEventListener("blur", async () => {
    el.classList.remove("valid", "invalid");
    removeInlineError(el);
    if (!el.value) {
      autofillPlaceholders();
      return;
    }
    const r = await fetch(
      `/validate_path?kind=${el.dataset.validate}&path=${encodeURIComponent(el.value)}`
    );
    const j = await r.json();
    el.classList.add(j.valid ? "valid" : "invalid");
    if (!j.valid) showInlineError(el, j.reason || "invalid path");
  });
}

function showInlineError(input, message) {
  removeInlineError(input);
  const div = document.createElement("div");
  div.className = "path-validation-error";
  div.textContent = message;
  (input.closest(".input-with-clear") || input).after(div);
}
function removeInlineError(input) {
  const holder = input.closest(".input-with-clear") || input;
  if (holder.nextElementSibling?.classList.contains("path-validation-error"))
    holder.nextElementSibling.remove();
}

// With a reference beatmap set, show what the backend would autofill for
// blank audio/output as placeholders (reference handleValidationResponse).
async function autofillPlaceholders() {
  const beatmap = $("beatmap_path").value.trim();
  if (!beatmap) return;
  try {
    const j = await postJSON("/validate_paths", {
      audio_path: $("audio_path").value.trim(),
      beatmap_path: beatmap,
      output_path: $("output_path").value.trim(),
    });
    if (j.audio_path && !$("audio_path").value.trim())
      $("audio_path").placeholder = j.audio_path;
    if (j.output_path && !$("output_path").value.trim())
      $("output_path").placeholder = j.output_path;
  } catch (e) { /* backend not reachable; placeholders stay */ }
}
$("beatmap_path").addEventListener("blur", autofillPlaceholders);

// Before submit: adopt placeholder values as real values
// (reference PathManager.applyPlaceholderValues).
function applyPlaceholderValues() {
  for (const id of ["audio_path", "output_path"]) {
    const el = $(id);
    // the static hint placeholders contain "path/to"; autofilled ones are
    // real filesystem paths from /validate_paths
    if (!el.value.trim() && el.placeholder
        && !el.placeholder.includes("path/to"))
      el.value = el.placeholder;
  }
}

async function postJSON(url, obj) {
  const r = await fetch(url, {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify(obj),
  });
  return r.json();
}

// =============================================================================
// File browsing (reference FileBrowser uses native pywebview dialogs; in a
// plain browser the server-side /browse listing backs a picker modal)
// =============================================================================

const Browse = {
  target: null, kind: "all", dir: "",

  async openFor(targetId, kind) {
    this.target = targetId;
    this.kind = kind;
    // desktop shell: prefer the native dialog (reference FileBrowser)
    const api = window.pywebview?.api;
    if (api?.browse_file && api?.browse_folder) {
      try {
        const path = kind === "dir"
          ? await api.browse_folder()
          : await api.browse_file(kind);
        if (path) this.pick(path);
        return;
      } catch (e) { /* fall through to the in-browser picker */ }
    }
    $("browse-modal").hidden = false;
    $("browse-pick-dir").hidden = kind !== "dir";
    await this.load($(targetId).value.trim().replace(/\/[^/]*$/, "") || "");
  },

  async load(dir) {
    const r = await fetch(
      `/browse?dir=${encodeURIComponent(dir)}&filter=${this.kind}`);
    const j = await r.json();
    if (j.error) {
      flash(j.error, "error");
      if (dir) await this.load("");  // fall back to the home directory
      return;
    }
    this.dir = j.dir;
    $("browse-dir").textContent = j.dir;
    $("browse-up").disabled = !j.parent;
    $("browse-up").dataset.parent = j.parent || "";
    const list = $("browse-list");
    list.innerHTML = "";
    const sep = j.dir.endsWith("/") ? "" : "/";
    for (const d of j.dirs) {
      const row = document.createElement("div");
      row.className = "browse-row dir";
      row.textContent = "📁 " + d;
      row.onclick = () => this.load(j.dir + sep + d);
      list.appendChild(row);
    }
    for (const f of j.files) {
      const row = document.createElement("div");
      row.className = "browse-row file";
      row.textContent = f;
      row.onclick = () => this.pick(j.dir + sep + f);
      list.appendChild(row);
    }
    if (!j.dirs.length && !j.files.length) {
      const row = document.createElement("div");
      row.className = "browse-row empty";
      row.textContent = "(empty)";
      list.appendChild(row);
    }
  },

  pick(path) {
    const input = $(this.target);
    input.value = path;
    this.close();
    input.dispatchEvent(new Event("input", { bubbles: true }));
    input.dispatchEvent(new Event("blur"));
    updateClearButtons();
    updateVisibility();
    persistState();
  },

  close() {
    $("browse-modal").hidden = true;
  },
};

for (const btn of document.querySelectorAll(".browse-btn")) {
  btn.onclick = () => Browse.openFor(btn.dataset.target, btn.dataset.kind);
}
$("browse-close").onclick = () => Browse.close();
$("browse-up").onclick = (e) => {
  const parent = e.target.dataset.parent;
  if (parent) Browse.load(parent);
};
$("browse-pick-dir").onclick = () => Browse.pick(Browse.dir);
$("browse-modal").onclick = (e) => {
  if (e.target.id === "browse-modal") Browse.close();
};

// =============================================================================
// Form state: persistence, export/import, reset (reference ConfigManager)
// =============================================================================

function formState() {
  const data = Object.fromEntries(new FormData(form));
  for (const cb of form.querySelectorAll("input[type=checkbox]"))
    data[cb.name] = cb.checked;
  data.in_context_options = [
    ...form.querySelectorAll("input[name=in_context_options]:checked"),
  ].map((e) => e.value);
  data.descriptor_select = [...descriptorState.entries()]
    .filter(([, s]) => s === "pos").map(([d]) => d);
  data.negative_descriptors = [...descriptorState.entries()]
    .filter(([, s]) => s === "neg").map(([d]) => d).join(",");
  return data;
}

function applyState(data) {
  const prevModel = form.elements.config?.value;
  for (const [k, v] of Object.entries(data)) {
    const el = form.elements[k];
    if (!el || k === "in_context_options") continue;
    if (el.type === "checkbox") el.checked = !!v;
    else el.value = v ?? "";
  }
  for (const cb of form.querySelectorAll("input[name=in_context_options]"))
    cb.checked = (data.in_context_options || []).includes(cb.value);
  descriptorState.clear();
  for (const d of data.descriptor_select || []) descriptorState.set(d, "pos");
  for (const d of (data.negative_descriptors || "").split(","))
    if (d.trim()) descriptorState.set(d.trim(), "neg");
  renderDescriptors();
  updateVisibility();
  updateClearButtons();
  // a state with a different model needs its descriptors/capabilities
  if (form.elements.config && form.elements.config.value !== prevModel)
    loadModelDependent();
}

function persistState() {
  localStorage.setItem("bh_config", JSON.stringify(formState()));
}
form.addEventListener("change", persistState);

const FORM_DEFAULTS = {
  gamemode: "", seed: "", audio_path: "", output_path: "", beatmap_path: "",
  difficulty: "", mapper_id: "", year: "", keycount: "", hold_note_ratio: "",
  scroll_speed_ratio: "", hp_drain_rate: "", circle_size: "",
  overall_difficulty: "", approach_rate: "", slider_multiplier: "",
  slider_tick_rate: "", start_time: "", end_time: "", cfg_scale: "1.0",
  temperature: "", top_p: "", extra: "",
  hitsounded: true, add_to_beatmap: false, export_osz: false,
  super_timing: false, use_server: false,
  in_context_options: [], descriptor_select: [], negative_descriptors: "",
};

$("export-config-btn").onclick = () => {
  const payload = {
    version: "1.0",
    timestamp: new Date().toISOString(),
    settings: formState(),
  };
  const blob = new Blob([JSON.stringify(payload, null, 2)], {
    type: "application/json",
  });
  const a = document.createElement("a");
  a.href = URL.createObjectURL(blob);
  a.download = "beatheritage_config.json";
  a.click();
  URL.revokeObjectURL(a.href);
  configStatus("Configuration exported", true);
};
$("import-config-btn").onclick = () => $("import-config-input").click();
$("import-config-input").onchange = async (e) => {
  const file = e.target.files[0];
  e.target.value = "";
  if (!file) return;
  try {
    const parsed = JSON.parse(await file.text());
    // accept both the wrapped export format and a bare form dump
    applyState(parsed.settings || parsed);
    persistState();
    configStatus(
      `Configuration imported (${parsed.timestamp || "unknown date"})`, true);
  } catch (err) {
    configStatus("Import failed: " + err.message, false);
  }
};
$("reset-config-btn").onclick = () => {
  if (!confirm("Reset all settings to their default values?")) return;
  localStorage.removeItem("bh_config");
  form.reset();
  applyState(FORM_DEFAULTS);
  loadModelDependent();
  configStatus("All settings reset to defaults", true);
};

function configStatus(message, ok) {
  const el = $("config-status");
  el.textContent = message;
  el.className = ok ? "ok" : "err";
  el.style.opacity = "1";
  setTimeout(() => { el.style.opacity = "0"; }, 5000);
}

// =============================================================================
// Server-side presets (/save_config, /load_config, /list_presets)
// =============================================================================

async function refreshPresets() {
  const names = await (await fetch("/list_presets")).json();
  $("preset-select").innerHTML = names
    .map((n) => `<option value="${n}">${n}</option>`)
    .join("");
}
$("save-preset-btn").onclick = async () => {
  const name = $("preset-name").value.trim();
  if (!name) return flash("Preset needs a name", "error");
  const j = await postJSON("/save_config", { name, form: formState() });
  if (!j.success) return flash("Save failed: " + j.error, "error");
  await refreshPresets();
  $("preset-select").value = name;
  configStatus(`Preset “${name}” saved`, true);
};
$("load-preset-btn").onclick = async () => {
  const name = $("preset-select").value;
  if (!name) return;
  const r = await fetch("/load_config?name=" + encodeURIComponent(name));
  if (r.ok) {
    applyState(await r.json());
    persistState();
    configStatus(`Preset “${name}” loaded`, true);
  }
};
$("delete-preset-btn").onclick = async () => {
  const name = $("preset-select").value;
  if (!name || !confirm(`Delete preset “${name}”?`)) return;
  const j = await postJSON("/delete_preset", { name });
  if (!j.success) return flash("Delete failed: " + j.error, "error");
  await refreshPresets();
  configStatus(`Preset “${name}” deleted`, true);
};
refreshPresets();

// Path autofill button (/validate_paths, reference web-ui.py:514).
$("autofill-btn").onclick = async () => {
  const j = await postJSON("/validate_paths", {
    audio_path: $("audio_path").value,
    beatmap_path: $("beatmap_path").value,
    output_path: $("output_path").value,
  });
  if (j.audio_path) $("audio_path").value = j.audio_path;
  if (j.output_path) $("output_path").value = j.output_path;
  if (j.errors && j.errors.length) j.errors.forEach((e) => flash(e, "error"));
  updateClearButtons();
};

$("open-folder-btn").onclick = () => {
  const folder =
    $("output_path").value ||
    ($("result-path").textContent || "").replace(/\/[^/]*$/, "");
  if (folder) fetch("/open_folder?folder=" + encodeURIComponent(folder));
};
$("open-log-btn").onclick = () => fetch("/open_log_file");
$("open-error-log-btn").onclick = async () => {
  // the newest run log holds the traceback (served from the log dir)
  const logs = await (await fetch("/logs")).json();
  if (logs.length)
    fetch("/open_log_file?path=" + encodeURIComponent(logs[logs.length - 1]));
};

try {
  const saved = localStorage.getItem("bh_config");
  if (saved) applyState(JSON.parse(saved));
} catch (e) { /* stale state */ }

// =============================================================================
// Progress: log buffer, tqdm parsing, step table, error detection
// (reference InferenceManager)
// =============================================================================

const TQDM = /(\d+)%\|.*?\| *(\d+)\/(\d+)/;
const PCT = /(\d+(?:\.\d+)?)%/;
const ERROR_INDICATORS = [
  "Traceback (most recent call last):",
  "Error executing job with overrides:",
  "FileNotFoundError:",
  "Exception:",
];
const STEP_ORDER = ["timing", "kiai", "map", "diffusion"];
const STEP_KEYWORDS = [
  { key: "timing", kw: ["generating timing"] },
  { key: "kiai", kw: ["generating kiai"] },
  { key: "map", kw: ["generating map"] },
  { key: "diffusion", kw: ["seq len", "refining positions"] },
];
const PROGRESS_TITLES = {
  "generating timing": "Generating timing",
  "generating kiai": "Generating kiai",
  "generating map": "Generating map",
  "seq len": "Refining positions",
  "refining positions": "Refining positions",
};

const Run = {
  logs: [],
  autoscroll: true,
  errored: false,
  errorLines: [],
  cancelled: false,
  stepStatus: {},
  stepStart: {},
  startTime: null,

  reset() {
    this.logs = [];
    this.errored = false;
    this.errorLines = [];
    this.cancelled = false;
    this.stepStatus = {};
    this.stepStart = {};
    this.startTime = Date.now();
    $("progress_output").textContent = "";
    $("progress-title").textContent = "";
    $("progress-title").classList.remove("error");
    $("progress-fill").style.width = "0%";
    $("progress-fill").classList.remove("error");
    $("progress-label").textContent = "";
    $("init-message").hidden = false;
    $("result-box").hidden = true;
    $("error-box").hidden = true;
    $("progress-section").hidden = false;
    for (const row of document.querySelectorAll("#progress-table tbody tr")) {
      setStepCell(row, "Pending", "status-pending");
      row.querySelector("td.time").textContent = "–";
    }
    $("autoscroll-toggle").checked = true;
    this.autoscroll = true;
    scrollToEl("progress-section");
  },

  append(line) {
    $("init-message").hidden = true;
    this.logs.push(line);
    const el = $("progress_output");
    const lines = el.textContent.split("\n");
    // tqdm lines overwrite in place like a terminal would
    if (TQDM.test(line) && TQDM.test(lines[lines.length - 1] || ""))
      lines[lines.length - 1] = line;
    else lines.push(line);
    el.textContent = lines.slice(-400).join("\n");
    if (this.autoscroll) el.scrollTop = el.scrollHeight;
  },

  stepRow(key) {
    return document.querySelector(`#progress-table tbody tr[data-step="${key}"]`);
  },

  markRunning(key) {
    const cur = this.stepStatus[key];
    if (cur === "running" || cur === "done") return;
    this.stepStatus[key] = "running";
    this.stepStart[key] = Date.now();
    setStepCell(this.stepRow(key), "Running", "status-running");
  },

  markDone(key) {
    if (this.stepStatus[key] === "done") return;
    this.stepStatus[key] = "done";
    const started = this.stepStart[key] || this.startTime || Date.now();
    const sec = ((Date.now() - started) / 1000).toFixed(1);
    const row = this.stepRow(key);
    setStepCell(row, "Done", "status-done");
    row.querySelector("td.time").textContent = sec + "s";
  },

  finishRunning(asError) {
    for (const [k, v] of Object.entries(this.stepStatus)) {
      if (v !== "running") continue;
      if (asError) {
        this.stepStatus[k] = "error";
        setStepCell(this.stepRow(k), "Error", "status-error");
      } else {
        this.markDone(k);
      }
    }
  },

  handleLine(line) {
    this.append(line);
    const lower = line.toLowerCase();

    if (!this.errored
        && ERROR_INDICATORS.some((ind) => line.includes(ind))) {
      this.errored = true;
      $("progress-title").textContent = "Error detected";
      $("progress-title").classList.add("error");
      $("progress-fill").classList.add("error");
    }
    if (this.errored) {
      this.errorLines.push(line);
      return;
    }

    for (const [kw, title] of Object.entries(PROGRESS_TITLES))
      if (lower.includes(kw)) $("progress-title").textContent = title;

    for (const d of STEP_KEYWORDS) {
      if (!d.kw.some((k) => lower.includes(k))) continue;
      this.markRunning(d.key);
      const idx = STEP_ORDER.indexOf(d.key);
      for (let i = 0; i < idx; i++)
        if (this.stepStatus[STEP_ORDER[i]] === "running")
          this.markDone(STEP_ORDER[i]);
    }

    const m = line.match(TQDM) || line.match(PCT);
    if (m) {
      $("progress-fill").style.width = m[1] + "%";
      $("progress-label").textContent = m[0].slice(0, 40);
    }
  },
};

function setStepCell(row, text, cls) {
  const td = row.querySelector("td.status");
  td.textContent = text;
  td.className = "status " + cls;
}

$("autoscroll-toggle").onchange = (e) => { Run.autoscroll = e.target.checked; };
$("copy-logs-btn").onclick = async () => {
  const text = Run.logs.join("\n");
  try {
    await navigator.clipboard.writeText(text);
    flash("Logs copied to clipboard");
  } catch (e) {
    const ta = document.createElement("textarea");
    ta.value = text;
    document.body.appendChild(ta);
    ta.select();
    document.execCommand("copy");
    ta.remove();
    flash("Logs copied to clipboard");
  }
};
$("download-logs-btn").onclick = () => {
  const blob = new Blob([Run.logs.join("\n")], { type: "text/plain" });
  const a = document.createElement("a");
  a.href = URL.createObjectURL(blob);
  a.download = "beatheritage_logs_"
    + new Date().toISOString().replace(/[:.]/g, "-") + ".txt";
  a.click();
  URL.revokeObjectURL(a.href);
};
$("clear-logs-btn").onclick = () => {
  Run.logs = [];
  $("progress_output").textContent = "";
};

async function streamInto(onLine) {
  const resp = await fetch("/stream_output");
  const reader = resp.body.getReader();
  const dec = new TextDecoder();
  let buf = "";
  while (true) {
    const { done, value } = await reader.read();
    if (done) break;
    buf += dec.decode(value);
    const parts = buf.split(/[\r\n]/);
    buf = parts.pop();
    for (const line of parts) {
      if (line.trim()) onLine(line);
    }
  }
  if (buf.trim()) onLine(buf);
}

// =============================================================================
// Generate
// =============================================================================

function validateSubmit() {
  applyPlaceholderValues();
  const audio = $("audio_path").value.trim();
  const beatmap = $("beatmap_path").value.trim();
  const output = $("output_path").value.trim();
  if (!audio && !beatmap) {
    flash("Either an audio path or a reference beatmap is required", "error");
    scrollToEl("audio_path");
    return false;
  }
  if (!output && !beatmap) {
    flash("Either an output path or a reference beatmap is required", "error");
    scrollToEl("output_path");
    return false;
  }
  if (beatmap && !beatmap.toLowerCase().endsWith(".osu")) {
    flash("Beatmap file must have the .osu extension", "error");
    showInlineError($("beatmap_path"), "must be a .osu file");
    scrollToEl("beatmap_path");
    return false;
  }
  return true;
}

form.onsubmit = async (e) => {
  e.preventDefault();
  if (!validateSubmit()) return;
  Run.reset();
  $("generate-btn").disabled = true;
  $("cancel-button").hidden = false;
  $("cancel-button").disabled = false;
  $("cancel-button").textContent = "Cancel";

  let resultPath = null;
  try {
    const r = await fetch("/start_inference", {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify(formState()),
    });
    if (!r.ok) {
      let err = "failed to start inference";
      try { err = (await r.json()).error || err; } catch (_) { /* html */ }
      flash(err, "error");
      $("progress-section").hidden = true;
      return;
    }

    await streamInto((line) => {
      Run.handleLine(line);
      const m = line.match(/saved to (.*\.osu)|Added generated content to (.*\.osu)/);
      if (m) resultPath = m[1] || m[2];
    });
  } catch (err) {
    // server restart / dropped stream: report instead of wedging the form
    Run.errored = true;
    flash("Connection to the generation process was lost", "error");
  } finally {
    $("generate-btn").disabled = false;
    $("cancel-button").hidden = true;
  }
  if ($("progress-section").hidden) return;

  if (Run.cancelled) {
    Run.finishRunning(false);
    $("progress-title").textContent = "Cancelled";
  } else if (Run.errored) {
    Run.finishRunning(true);
    $("progress-title").textContent = "Processing failed";
    $("progress-fill").style.width = "100%";
    $("error-box").hidden = false;
    $("error-summary").textContent = summarizeError(Run.errorLines.join("\n"));
    flash(summarizeError(Run.errorLines.join("\n")), "error");
  } else {
    $("progress-title").textContent = "Processing complete";
    $("progress-fill").style.width = "100%";
    Run.finishRunning(false);
    Run.markDone("export");
    if (resultPath) {
      $("result-box").hidden = false;
      $("result-path").textContent = resultPath;
    }
  }
};

function summarizeError(text) {
  if (text.includes("FileNotFoundError:")) {
    const m = text.match(/FileNotFoundError:.*?file (.*?) not found/);
    return m ? `File not found: ${m[1]}` : "A required file was not found.";
  }
  if (text.includes("Error executing job"))
    return "The generation task failed to start or execute.";
  return "An error occurred during processing — see the log below.";
}

$("cancel-button").onclick = async () => {
  const btn = $("cancel-button");
  btn.disabled = true;
  btn.textContent = "Cancelling…";
  const r = await fetch("/cancel", { method: "POST" });
  if (r.ok) {
    Run.cancelled = true;
    flash("Inference cancelled", "cancel");
  } else {
    flash("Failed to cancel", "error");
    btn.disabled = false;
    btn.textContent = "Cancel";
  }
};

// =============================================================================
// MaiMod
// =============================================================================

$("maimod-form").onsubmit = async (e) => {
  e.preventDefault();
  const log = $("maimod-log");
  const results = $("maimod-results");
  log.textContent = "";
  results.innerHTML = "";
  const data = Object.fromEntries(new FormData($("maimod-form")));
  const r = await fetch("/start_maimod", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify(data),
  });
  if (!r.ok) {
    log.textContent = "error: " + (await r.json()).error;
    return;
  }
  await streamInto((line) => {
    const lines = log.textContent.split("\n");
    if (TQDM.test(line) && TQDM.test(lines[lines.length - 1] || ""))
      lines[lines.length - 1] = line;
    else lines.push(line);
    log.textContent = lines.slice(-400).join("\n");
    log.scrollTop = log.scrollHeight;
  });
  const suggs = await (await fetch("/maimod_result")).json();
  renderSuggestions(suggs);
};
$("maimod-cancel").onclick = () => fetch("/cancel", { method: "POST" });

function renderSuggestions(suggs) {
  const box = $("maimod-results");
  if (!suggs.length) {
    box.innerHTML = "<p>No issues found — the model agrees with this beatmap.</p>";
    return;
  }
  const byCat = {};
  for (const s of suggs) (byCat[s.category] ||= []).push(s);
  for (const cat of Object.keys(byCat).sort()) {
    const head = document.createElement("div");
    head.className = "cat-head";
    head.textContent = `${cat} (${byCat[cat].length})`;
    box.appendChild(head);
    for (const s of byCat[cat].slice(0, 25)) {
      const div = document.createElement("div");
      div.className = "sugg" + (s.severity >= 5 ? " hot" : "");
      div.innerHTML =
        `<a href="${s.edit_link}">${s.timestamp}</a> ` +
        `<strong>${s.message}</strong>` +
        `<div class="meta">severity ${s.severity} — got ${s.actual}, ` +
        `model expected ${s.expected}</div>`;
      box.appendChild(div);
    }
  }
}

// =============================================================================
// Beatmap preview — renders the generated .osu on a canvas with a time
// scrubber (beyond the reference client, which only links the output file).
// Slider bodies are drawn as polylines through the control points (the
// true osu! curves are Bezier/Catmull/arc; the polyline is an honest
// preview approximation).
// =============================================================================

const Preview = {
  objects: [], radius: 30, preempt: 1200, length: 1, playing: false,

  parse(text) {
    const sections = {};
    let cur = null;
    for (const raw of text.split(/\r?\n/)) {
      const line = raw.trim();
      if (!line || line.startsWith("//")) continue;
      const m = line.match(/^\[(\w+)\]$/);
      if (m) { cur = m[1]; sections[cur] = []; continue; }
      if (cur) sections[cur].push(line);
    }
    const diff = {};
    for (const l of sections.Difficulty || []) {
      const [k, v] = l.split(":");
      diff[k.trim()] = parseFloat(v);
    }
    const cs = isNaN(diff.CircleSize) ? 4 : diff.CircleSize;
    this.radius = 54.4 - 4.48 * cs;
    const ar = isNaN(diff.ApproachRate) ? 9 : diff.ApproachRate;
    this.preempt = ar < 5 ? 1800 - 120 * ar : 1200 - 150 * (ar - 5);
    const sm = diff.SliderMultiplier || 1.4;

    // timing points: [time, beatLength, ...] — negative beatLength is an
    // inherited (SV) point: SV = -100 / beatLength
    const timing = (sections.TimingPoints || []).map((l) => {
      const p = l.split(",").map(Number);
      return { time: p[0], beatLength: p[1], uninherited: p[1] > 0 };
    });
    const beatAt = (t) => {
      let bl = 500;
      for (const tp of timing)
        if (tp.uninherited && tp.time <= t) bl = tp.beatLength;
      return bl;
    };
    const svAt = (t) => {
      let sv = 1;
      for (const tp of timing) {
        if (tp.uninherited && tp.time <= t) sv = 1;
        else if (!tp.uninherited && tp.time <= t) sv = -100 / tp.beatLength;
      }
      return sv;
    };

    this.objects = [];
    for (const l of sections.HitObjects || []) {
      const parts = l.split(",");
      const [x, y, time, type] = parts.slice(0, 4).map(Number);
      const o = { x, y, time, end: time, kind: "circle", path: [[x, y]] };
      if (type & 2) {
        o.kind = "slider";
        const curve = (parts[5] || "").split("|").slice(1);
        for (const pt of curve) {
          const [cx, cy] = pt.split(":").map(Number);
          if (!isNaN(cx)) o.path.push([cx, cy]);
        }
        const slides = parseInt(parts[6] || "1", 10) || 1;
        const len = parseFloat(parts[7] || "0") || 0;
        o.end = time + (len / (sm * 100 * svAt(time))) * beatAt(time) * slides;
      } else if (type & 8) {
        o.kind = "spinner";
        o.end = parseInt(parts[5] || time, 10) || time;
        o.x = 256; o.y = 192;
      } else if (type & 128) {
        o.kind = "hold";
        o.end = parseInt((parts[5] || "").split(":")[0] || time, 10) || time;
      }
      this.objects.push(o);
    }
    this.length = this.objects.length
      ? Math.max(...this.objects.map((o) => o.end)) + 1000 : 1;
  },

  draw(t) {
    const canvas = $("preview-canvas");
    const ctx = canvas.getContext("2d");
    const sx = canvas.width / 512, sy = canvas.height / 384;
    ctx.fillStyle = "#14181f";
    ctx.fillRect(0, 0, canvas.width, canvas.height);
    const visible = this.objects.filter(
      (o) => o.time - this.preempt <= t && t <= o.end + 250);
    for (const o of visible.reverse()) {
      const r = this.radius * sx;
      const alpha = Math.min(1, (t - (o.time - this.preempt)) / 400);
      ctx.globalAlpha = Math.max(0.15, alpha);
      if (o.kind === "slider" && o.path.length > 1) {
        ctx.beginPath();
        ctx.lineWidth = 2 * r;
        ctx.lineCap = ctx.lineJoin = "round";
        ctx.strokeStyle = "#2a3342";
        ctx.moveTo(o.path[0][0] * sx, o.path[0][1] * sy);
        for (const [px, py] of o.path.slice(1))
          ctx.lineTo(px * sx, py * sy);
        ctx.stroke();
        ctx.lineWidth = 2;
      }
      if (o.kind === "spinner") {
        ctx.beginPath();
        ctx.strokeStyle = "#8a93a5";
        ctx.lineWidth = 3;
        ctx.arc(o.x * sx, o.y * sy, 140 * sx, 0, 2 * Math.PI);
        ctx.stroke();
        continue;
      }
      ctx.beginPath();
      ctx.fillStyle = t >= o.time ? "#4a9eda" : "#3b6ea5";
      ctx.arc(o.x * sx, o.y * sy, r, 0, 2 * Math.PI);
      ctx.fill();
      ctx.strokeStyle = "#e8ecf2";
      ctx.lineWidth = 2.5;
      ctx.stroke();
      if (t < o.time) {
        // approach circle closes in over the preempt window
        const k = 1 + 3 * (o.time - t) / this.preempt;
        ctx.beginPath();
        ctx.strokeStyle = "#c9d3e0";
        ctx.lineWidth = 1.5;
        ctx.arc(o.x * sx, o.y * sy, r * k, 0, 2 * Math.PI);
        ctx.stroke();
      }
    }
    ctx.globalAlpha = 1;
  },

  show(t) {
    const ms = Math.max(0, Math.min(this.length, t));
    const mins = Math.floor(ms / 60000);
    const secs = ((ms % 60000) / 1000).toFixed(2).padStart(5, "0");
    $("preview-clock").textContent = `${mins}:${secs}`;
    this.draw(ms);
  },

  tick() {
    if (!this.playing) return;
    const el = $("preview-time");
    const next = Number(el.value) + 16;
    if (next >= this.length) { this.stop(); return; }
    el.value = next;
    this.show(next);
    requestAnimationFrame(() => this.tick());
  },

  stop() {
    this.playing = false;
    $("preview-play").textContent = "▶";
  },

  async open() {
    const box = $("preview-box");
    if (!box.hidden) { box.hidden = true; this.stop(); return; }
    const r = await fetch("/result_beatmap");
    if (!r.ok) {
      flash("No generated beatmap available to preview", "error");
      return;
    }
    this.parse(await r.text());
    $("preview-meta").textContent =
      `${this.objects.length} objects · CS radius ${this.radius.toFixed(0)}px`;
    const el = $("preview-time");
    el.max = this.length;
    el.value = this.objects.length ? Math.max(0, this.objects[0].time - 500) : 0;
    box.hidden = false;
    this.show(Number(el.value));
  },
};

$("preview-btn").onclick = () => Preview.open();
$("preview-time").oninput = (e) => { Preview.stop(); Preview.show(Number(e.target.value)); };
$("preview-play").onclick = () => {
  if (Preview.playing) { Preview.stop(); return; }
  Preview.playing = true;
  $("preview-play").textContent = "⏸";
  Preview.tick();
};

// =============================================================================
// Boot
// =============================================================================

loadModels();
updateClearButtons();
updateVisibility();
