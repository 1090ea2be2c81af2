"""Search execution: request compilation, collectors, facets, field fetch.

Reference layer L4 (SURVEY.md §1): SearchRequestProcessor/SearchContext,
collectors (server/search/collectors/), facets (server/facet/), field fetch
(SearchHandler.FillDocsTask).
"""
