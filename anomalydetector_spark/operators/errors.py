"""Error taxonomy — message templates matching the reference contract.

The reference raises these exact messages as whole-job failures
(aml_component/error_messages.py:1-10, asserted verbatim by its
tests/test_error_input.py:35-120). Our engine emits them as per-partition
verdict rows instead of raising (SURVEY.md §3 EP2), but the text contract
is preserved so violation consumers can match on it.
"""

INVALID_TIMESTAMPS = "The timestamp column specified is malformed."
INVALID_SERIES_ORDER = "The timestamp column specified is not in ascending order."
DUPLICATE_SERIES_TIMESTAMP = "The timestamp column specified has duplicated timestamps."
INVALID_VALUE_FORMAT = 'The data in column "{0}" can not be parsed as float values.'
INVALID_SERIES_VALUE = 'The data in column "{0}" contains nan values.'
VALUE_OVERFLOW = 'The magnitude of data in column "{0}" exceeds limitation.'
NOT_ENOUGH_POINTS = "The dataset should contain at least {0} points to run this module."
INVALID_BATCH_SIZE = (
    'The "batchSize" parameter should be at least {0} or 0 '
    "that indicates to run all data in a batch."
)
COLUMN_NOT_FOUND = 'Column with name or index "{0}" not found.'

# engine-only additions (no reference analog; SURVEY.md §2.2 note)
DUPLICATE_KEY = 'The key column "{0}" contains duplicated values.'
DANGLING_REFERENCE = 'Column "{0}" contains values absent from dimension "{1}".'
TEXT_EXTRACTION_MISMATCH = (
    'Column "{0}" is not byte-identical to the text extracted from "{1}".'
)
INCONSISTENT_KEY_TEXT = 'Rows sharing the same "{0}" disagree on text bytes.'
ROBOTS_DISALLOWED = (
    'Column "{0}" contains URLs the robots policy disallows for '
    'agent "{1}".'
)
FD_VIOLATION = 'Functional dependency "{0}" -> "{1}" violated: some "{0}" values map to multiple "{1}" values.'
ROBUST_OUTLIERS = (
    'Column "{0}" has values farther than {1}x the MAD from the '
    "partition median."
)
STALE_PARTITION = (
    'Column "{0}" is stale: newest timestamp lags the reference by '
    '{1}s (max allowed {2}s).'
)
NO_TIMESTAMPS = 'Column "{0}" has no non-null timestamps to assess freshness.'
JSON_SCHEMA_VIOLATION = (
    'Column "{0}" has rows violating the declared JSON payload schema.'
)
