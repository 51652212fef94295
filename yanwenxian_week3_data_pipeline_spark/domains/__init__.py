"""Domain rule sets: concrete validation-rule lists and cleaning configs for
specific record shapes (articles = the reference's domain; documents = the
driver's synthetic corpus)."""
