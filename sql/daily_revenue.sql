-- Parameterized analytics script (S1 surface, utils.py:312-339):
-- revenue per order date from {start_date}, HAVING-gated
-- (the utils.py:322-323 docstring contract).
SELECT CAST(CAST(o_orderdate AS DATE) AS STRING) AS order_date,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '{start_date}'
GROUP BY CAST(o_orderdate AS DATE)
HAVING count(*) > {min_orders}
