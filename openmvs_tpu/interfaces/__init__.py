"""SfM frontend importers/exporters (apps/Interface* equivalents)."""
