"""Non-HTML sources: JSON API scan (S2) and MediaWiki scan (S3/S4)."""
