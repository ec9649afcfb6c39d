"""Sources: request-record stream derivation (batch + streaming readers)."""
