"""Engine feature flags.

``UUID_FORMAT``: mirrors the reference's ``uuid`` Cargo feature
(``json_schema_rs/Cargo.toml:26-27``, ``validator/mod.rs:279-289``) — when
enabled, ``format: "uuid"`` on string instances is validated; default OFF to
match the reference's default build.
"""

UUID_FORMAT = False

#: uuid::Uuid::parse_str accepted forms: simple (32 hex), hyphenated
#: (8-4-4-4-12), braced hyphenated, and urn:uuid: prefixed; hex is
#: case-insensitive.
UUID_REGEX = (
    r"^(?i)(?:[0-9a-f]{32}"
    r"|[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
    r"|\{[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}\}"
    r"|urn:uuid:[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
    r")$"
)
