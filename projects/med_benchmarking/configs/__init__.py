"""Med-benchmarking config package: importing it registers the datasets."""

import projects.med_benchmarking.datasets  # noqa: F401  (external_store registrations)
