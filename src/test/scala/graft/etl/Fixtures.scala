package graft.etl

import java.nio.file.{Files, Path}

/** Synthesizes the six source CSVs with the reference's documented
  * dirtiness (FIXTURES.md §A): padded names, single-letter codes with
  * trailing spaces, yyyyMMdd int dates incl. 0/garbage, sales ≠ qty×price,
  * NAS-prefixed ERP ids, country variants.
  */
object Fixtures {

  def write(dir: Path): Unit = {
    def w(name: String, lines: Seq[String]): Unit =
      Files.write(dir.resolve(name), (lines.mkString("\n") + "\n").getBytes)

    w("cust_info.csv", Seq(
      "cst_id,cst_key,cst_firstname,cst_lastname,cst_marital_status,cst_gndr,cst_create_date",
      "1,AW00011000,  Jon ,Yang  ,M,M,2025-10-06",
      "2,AW00011001,Eugene,Huang,S,M,2025-10-06",
      "3,AW00011002,Ruben,Torres,M,M,2025-10-07",
      "4,AW00011003,Christy,Zhu,S,F,2025-10-07",
      "5,AW00011004,Elizabeth, Johnson ,S,F,2025-10-08",
      // duplicate id 5 with later create date — dedup keeps this one
      "5,AW00011004,Elisabeth,Johnson,M,F,2025-10-09",
      // empty codes → n/a
      "6,AW00011005,Julio,Ruiz,,,2025-10-08",
      // null id row — filtered in silver
      ",AW00011006,Orphan,Row,S,M,2025-10-08"))

    w("prd_info.csv", Seq(
      "prd_id,prd_key,prd_nm,prd_cost,prd_line,prd_start_dt,prd_end_dt",
      "210,CO-RF-FR-R92B-58,HL Road Frame - Black- 58,,R ,01-07-2025,",
      "211,CO-RF-FR-R92R-58,HL Road Frame - Red- 58,1263,R ,01-07-2025,",
      "212,AC-HE-HL-U509-R,Sport-100 Helmet- Red,13,S ,01-07-2025,",
      "213,CL-SO-SO-R809-M,Mountain Bike Socks- M,4,M ,01-07-2025,",
      "214,BI-MB-BK-M82S-38,Mountain-100 Silver- 38,1912,T ,15-07-2025,"))

    w("sales_details.csv", Seq(
      "sls_ord_num,sls_prd_key,sls_cust_id,sls_order_dt,sls_ship_dt,sls_due_dt,sls_sales,sls_quantity,sls_price",
      "SO43697,FR-R92B-58,1,20251011,20251018,20251023,3578.27,1,3578.27",
      "SO43698,HL-U509-R,2,20251011,20251018,20251023,34.99,1,34.99",
      // sales=0 and bad sales → recompute qty × |price|
      "SO43699,SO-R809-M,3,20251012,20251019,20251024,0,2,4.99",
      "SO43700,FR-R92R-58,4,20251013,20251020,20251025,100.00,1,3374.99",
      // order_dt = 0 and garbage 7-digit date → NULL
      "SO43701,HL-U509-R,5,0,20251020,20251025,34.99,1,34.99",
      "SO43702,SO-R809-M,6,2025101,20251021,20251026,9.98,2,4.99",
      // negative price → derive from sales
      "SO43703,BK-M82S-38,1,20251014,20251021,20251026,2294.99,1,-2294.99"))

    w("LOC_A101.csv", Seq(
      "cid,cntry",
      "AW-00011000,USA",
      "AW-00011001,US",
      "AW-00011002,United States",
      "AW-00011003,DE",
      "AW-00011004,Germany",
      "AW-00011005,"))

    w("CUST_AZ12.csv", Seq(
      "cid,bdate,gen",
      "NASAW00011000,1971-10-06,M",
      "NASAW00011001,1976-05-10,Male",
      "AW00011002,1971-02-09,F",
      "AW00011003,1973-08-14,",
      // future birthdate → nulled in silver
      "NASAW00011004,2035-01-01,Female"))

    w("PX_CAT_G1V2.csv", Seq(
      "id,cat,subcat,maintenance",
      "CO_RF,Components,Road Frames,Yes",
      "AC_HE,Accessories,Helmets,No",
      "CL_SO,Clothing,Socks,No",
      "BI_MB,Bikes,Mountain Bikes,Yes"))
  }

  /** Second-batch deltas: one changed customer (SCD1 update), one changed
    * product version (SCD2), two new sales rows past the watermark plus one
    * old duplicate row that must NOT be re-ingested. */
  def writeDelta(dir: Path): Unit = {
    def w(name: String, lines: Seq[String]): Unit =
      Files.write(dir.resolve(name), (lines.mkString("\n") + "\n").getBytes)

    w("cust_info.csv", Seq(
      "cst_id,cst_key,cst_firstname,cst_lastname,cst_marital_status,cst_gndr,cst_create_date",
      "1,AW00011000,Jon,Yang,M,M,2025-10-06",          // unchanged (post-trim)
      "2,AW00011001,Eugene,Huang,M,M,2025-10-06",      // marital S→M: SCD1 update
      "3,AW00011002,Ruben,Torres,M,M,2025-10-07",
      "4,AW00011003,Christy,Zhu,S,F,2025-10-07",
      "5,AW00011004,Elisabeth,Johnson,M,F,2025-10-09",
      "6,AW00011005,Julio,Ruiz,,,2025-10-08",
      "7,AW00011007,Marco,Mehta,S,M,2025-10-12"))      // new key: SCD1 insert

    w("prd_info.csv", Seq(
      "prd_id,prd_key,prd_nm,prd_cost,prd_line,prd_start_dt,prd_end_dt",
      "210,CO-RF-FR-R92B-58,HL Road Frame - Black- 58,,R ,01-07-2025,",
      "211,CO-RF-FR-R92R-58,HL Road Frame - Red- 58,1300,R ,01-07-2025,", // cost change: SCD2
      "212,AC-HE-HL-U509-R,Sport-100 Helmet- Red,13,S ,01-07-2025,",
      "213,CL-SO-SO-R809-M,Mountain Bike Socks- M,4,M ,01-07-2025,",
      "214,BI-MB-BK-M82S-38,Mountain-100 Silver- 38,1912,T ,15-07-2025,"))

    w("sales_details.csv", Seq(
      "sls_ord_num,sls_prd_key,sls_cust_id,sls_order_dt,sls_ship_dt,sls_due_dt,sls_sales,sls_quantity,sls_price",
      // pre-watermark duplicate of SO43697 — must be skipped by the delta filter
      "SO43697,FR-R92B-58,1,20251011,20251018,20251023,3578.27,1,3578.27",
      "SO43720,FR-R92R-58,7,20251101,20251108,20251113,3374.99,1,3374.99",
      "SO43721,SO-R809-M,2,20251102,20251109,20251114,9.98,2,4.99"))

    w("LOC_A101.csv", Seq("cid,cntry", "AW-00011000,USA", "AW-00011007,US"))
    w("CUST_AZ12.csv", Seq("cid,bdate,gen", "NASAW00011007,1980-01-01,M"))
    w("PX_CAT_G1V2.csv", Seq(
      "id,cat,subcat,maintenance",
      "CO_RF,Components,Road Frames,Yes",
      "AC_HE,Accessories,Helmets,No",
      "CL_SO,Clothing,Socks,No",
      "BI_MB,Bikes,Mountain Bikes,Yes"))
  }
}
