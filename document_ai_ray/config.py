"""Frozen configuration + explicit Arrow schemas for the extraction engine.

The reference threads a mutable hyperparameter dict through its pipeline
(`/root/reference/main.py:24-31`, `analysis/cv/tuning.py:433-439`) and
*infers* its result template from a sample golden JSON
(`/root/reference/utils.py:21-28`).  Here both are explicit: a frozen
dataclass passed to actor ``__init__`` and a declared `pyarrow.Schema`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input schema — fixed by BASELINE.json input_hint.
# ---------------------------------------------------------------------------

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# Three-way field status preserving the reference's sentinel semantics
# (`<NOT_FOUND>` / `<EMPTY>` / value — /root/reference/analysis/cv/
# document_parsing.py:167,195 and validation/entities.py:49-58).
STATUS_FOUND = "FOUND"
STATUS_EMPTY = "EMPTY"
STATUS_NOT_FOUND = "NOT_FOUND"

BLOCK_STRUCT = pa.struct(
    [
        pa.field("start", pa.int64()),        # char offset into the full text buffer
        pa.field("end", pa.int64()),
        pa.field("score", pa.float64()),      # content score (higher = more main-content)
        pa.field("kept", pa.bool_()),
        pa.field("tag_path", pa.string()),    # e.g. "html/body/main/p"
        pa.field("link_density", pa.float64()),
    ]
)

QUALITY_STRUCT = pa.struct(
    [
        pa.field("is_readable", pa.bool_()),
        pa.field("charset_ok", pa.bool_()),
        pa.field("parse_ok", pa.bool_()),
        pa.field("yield_ratio", pa.float64()),   # extracted chars / total text chars
        pa.field("n_blocks", pa.int32()),
        pa.field("n_kept", pa.int32()),
        pa.field("has_byline", pa.bool_()),      # analogue of signature presence
        pa.field("has_contact", pa.bool_()),     # analogue of stamp presence
    ]
)

# Output schema — declared up front (SURVEY.md §1).  `html` is dropped
# immediately after extraction so downstream shuffles never move it.
RESULT_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("lang", pa.string()),
        pa.field("content_type", pa.string()),          # text/html | application/pdf | unknown
        pa.field("extracted_text", pa.string()),        # byte-exact invariant
        pa.field("fields", pa.map_(pa.string(), pa.string())),
        pa.field("field_status", pa.map_(pa.string(), pa.string())),
        pa.field("blocks", pa.list_(BLOCK_STRUCT)),
        pa.field("quality", QUALITY_STRUCT),
        pa.field("pred_lang", pa.string()),
        pa.field("error", pa.string()),                 # null on success
    ]
)

VALIDATED_SCHEMA = RESULT_SCHEMA.append(pa.field("refused_causes", pa.list_(pa.string()))).append(
    pa.field("validated", pa.bool_())
)

# The 14-cause vocabulary, mirroring the reference's refusal causes
# (/root/reference/performances.py:145-149, validation/entities.py:87-119)
# translated to web-text analogues.
CAUSES = [
    "quality_is_not_ok",            # ≙ quality_is_not_ok
    "extracted_text_is_empty",      # ≙ block4 empty
    "charset_error",                # ≙ image unreadable
    "parse_error",                  # ≙ SAM/crop failure
    "pdf_parse_error",              # ≙ pdf rasterization failure
    "too_short",                    # ≙ block filling not ok
    "link_farm",                    # ≙ signature/stamp missing analogue (page is nav only)
    "title_is_not_filled",          # ≙ driver name not filled
    "author_is_not_filled",         # ≙ company not in list
    "date_is_not_filled",           # ≙ restitution date not filled
    "reference_is_not_filled",      # ≙ plate number mismatch
    "contact_is_not_present",       # ≙ stamp missing
    "byline_is_not_present",        # ≙ signature missing
    "lang_mismatch",                # ≙ mileage mismatch analogue
]


@dataclass(frozen=True)
class ExtractConfig:
    """Hyperparameters for the extraction pipeline.

    Analogous to the reference's hyperparameter dict
    (/root/reference/main.py:24-31): `distance_margin`, `max_distance`,
    `minimum_overlap` become fuzzy-label margin / value-window / block
    thresholds.  Frozen so actor state is immutable and runs are
    reproducible.
    """

    # --- block scoring (≙ template-matching thresholds) ---
    min_block_chars: int = 25           # blocks shorter than this are boilerplate
    max_link_density: float = 0.35      # blocks more link-dense than this are boilerplate
    chrome_max_link_density: float = 0.10   # stricter bound inside nav/header/footer/aside
    chrome_min_chars: int = 80
    heading_smoothing: bool = True      # keep short headings adjacent to kept blocks

    # --- whitespace canon (byte-identity depends on this; documented in
    # stages/html_extract.py) ---
    collapse_whitespace: bool = True

    # --- field extraction (≙ find_next_right_word params,
    # /root/reference/analysis/cv/document_parsing.py:132-198) ---
    field_labels: tuple[str, ...] = ("title", "author", "date", "reference", "contact", "license")
    distance_margin: int = 1            # max Levenshtein distance for fuzzy label match
    max_value_chars: int = 200          # value window after the label

    # --- quality classification ---
    min_yield_ratio: float = 0.2
    min_readable_chars: int = 20

    # --- batching knobs (used by pipeline assembly, not the actor) ---
    batch_size: int = 1024
    # giant-payload skew mitigation (north_rule: "size-bucketed salting
    # for giant HTML/PDF rows"): pre-split input blocks so no task's
    # batch carries more than this many payload bytes — a 100 MB page
    # becomes its own single-row block the scheduler places
    # independently instead of a 1024-row straggler batch.  None
    # disables (restores plain row-count batching).
    max_payload_bytes: int | None = 8 << 20
    # None -> size the actor pool to the cluster's CPU count at pipeline
    # build time (a fixed cap under-uses bigger clusters)
    concurrency: int | None = None


DEFAULT_CONFIG = ExtractConfig()
